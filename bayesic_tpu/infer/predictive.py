"""Posterior/prior predictive sampling.

Blueprint: SURVEY.md C3/C21 periphery — the standard PPL utility a reference
user expects: push posterior draws (from SVI guides, MCMC samples, or SMC
particles) back through the generative model to sample observed/deterministic
sites.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import handlers

__all__ = ["Predictive"]


class Predictive:
    """Vectorized predictive sampler.

    ``posterior_samples`` is a dict of *constrained* latent values with a
    leading sample dimension (e.g. ``MCMCResult.samples`` reshaped to
    ``(num, ...)``, or ``svi.sample_posterior(...)``).  Call with a PRNG key
    to get samples of every non-conditioned site (observed sites are re-
    sampled from their likelihood; deterministic sites recorded).
    """

    def __init__(self, model, posterior_samples=None, num_samples=None,
                 model_args=(), model_kwargs=None, return_sites=None):
        self.model = model
        self.posterior_samples = posterior_samples or {}
        if posterior_samples:
            leaves = jax.tree_util.tree_leaves(posterior_samples)
            self.num_samples = leaves[0].shape[0]
        else:
            if num_samples is None:
                raise ValueError(
                    "pass posterior_samples or num_samples (prior "
                    "predictive)"
                )
            self.num_samples = int(num_samples)
        self._args = model_args
        self._kwargs = model_kwargs or {}
        self.return_sites = return_sites

    def __call__(self, key):
        def one(i):
            k = jax.random.fold_in(key, i)
            data = {
                name: vals[i] for name, vals in
                self.posterior_samples.items()
            }
            tr = handlers.trace(
                handlers.substitute(
                    handlers.seed(
                        handlers.uncondition(self.model), rng_key=k
                    ),
                    data=data,
                )
            ).get_trace(*self._args, **self._kwargs)
            out = {}
            for name, site in tr.items():
                if site["type"] in ("sample", "deterministic") \
                        and name not in data:
                    out[name] = site["value"]
            if self.return_sites is not None:
                out = {n: v for n, v in out.items()
                       if n in self.return_sites}
            return out

        return jax.vmap(one)(jnp.arange(self.num_samples))
