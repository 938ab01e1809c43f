"""Pointwise log-likelihood of observed sites under posterior draws.

Blueprint: SURVEY.md C21/C24 periphery — the standard PPL capability a
reference user expects next to ``Predictive``: evaluate every observed
site's log-density at each posterior draw, keeping the per-datapoint
(plate/batch) granularity.  This is the input to the WAIC / PSIS-LOO
model-comparison diagnostics in :mod:`bayesic_tpu.utils.compare`.

Granularity note: ``log_prob`` sums event dimensions, so a site declared
via ``.to_event(k)`` contributes ONE pointwise term per remaining batch
element (a fully-`to_event`'d site is a single term).  Declare the
datapoint dimension with ``plate`` / batch shape to get per-observation
terms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import handlers

__all__ = ["log_likelihood"]


def log_likelihood(model, posterior_samples, model_args=(),
                   model_kwargs=None, sites=None, key=None):
    """Per-draw, per-datapoint log-likelihood of each observed site.

    Parameters
    ----------
    model: the generative model (observed sites conditioned via ``obs=`` or
        an outer ``handlers.condition``).
    posterior_samples: dict of *constrained* latent values with a leading
        sample dimension — ``MCMCResult.samples`` reshaped to ``(num, ...)``,
        ``svi.sample_posterior(...)``, or SMC particles.
    sites: optional iterable restricting which observed sites to evaluate.
    key: PRNG key, only needed when the model has latent sites NOT covered
        by ``posterior_samples`` (they are sampled from the prior per draw).

    Returns a dict ``site name -> (num_samples, *batch_shape)`` array of
    ``scale``-free log-densities (subsample scaling is a training-time
    correction and is deliberately NOT applied here — run on full data).
    """
    leaves = jax.tree_util.tree_leaves(posterior_samples)
    if not leaves:
        raise ValueError("posterior_samples is empty")
    num = leaves[0].shape[0]
    model_kwargs = model_kwargs or {}
    key = jax.random.PRNGKey(0) if key is None else key

    def one(i):
        data = {n: v[i] for n, v in posterior_samples.items()}
        tr = handlers.trace(
            handlers.substitute(
                handlers.seed(model, rng_key=jax.random.fold_in(key, i)),
                data=data,
            )
        ).get_trace(*model_args, **model_kwargs)
        out = {}
        for name, site in tr.items():
            if site["type"] != "sample" or not site["is_observed"]:
                continue
            if sites is not None and name not in sites:
                continue
            out[name] = site["dist"].log_prob(site["value"])
        if not out:
            raise ValueError(
                "model has no observed sample sites (pass obs= or wrap in "
                "handlers.condition)"
            )
        return out

    return jax.vmap(one)(jnp.arange(num))
