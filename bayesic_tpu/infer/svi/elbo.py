"""Reparameterized ELBO estimators.

Blueprint: SURVEY.md C5 — "single/multi-sample reparameterized ELBO
(E_q[logp - logq]), mini-batch likelihood scaling (N/B), gradient via
jax.grad" (BASELINE.json north_star "reparameterized ELBO estimators with
mini-batch subsampling").

The mini-batch scale factor itself lives in the log-joint (plate handler,
SURVEY.md C3/C4); this module only has to draw the shared mini-batch indices
once per step so every particle sees the same batch.  Optional
sticking-the-landing (``stl=True``) drops the score-function term of the
gradient by stopping gradients through q's parameters in log q — lower
variance at no cost for Gaussian guides.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["draw_subsample", "make_elbo"]


def draw_subsample(info, key):
    """Draw one index array per subsampled plate (shared across particles).

    Honors the plate's ``replacement`` flag: with-replacement uniform draws
    are unbiased and O(B) (SURVEY.md C5, the default); ``replacement=False``
    plates get an O(N log N) no-replacement draw matching their declared
    semantics (ADVICE r1)."""
    out = {}
    for i, (name, (size, ssize, replacement)) in enumerate(
        sorted(info.subsample_sites.items())
    ):
        k = jax.random.fold_in(key, i)
        if replacement:
            out[name] = jax.random.randint(k, (ssize,), 0, size)
        else:
            out[name] = jax.random.choice(k, size, (ssize,), replace=False)
    return out


def make_elbo(logdensity, guide, num_particles=1, stl=True, info=None,
              iwae=False):
    """Returns ``elbo(params, key, subsample=None) -> scalar`` (a stochastic
    lower bound estimate; maximise it).

    ``iwae=True`` returns the importance-weighted bound
    ``logsumexp_k(log p - log q) - log K`` (Burda et al. 2016) — a strictly
    tighter lower bound on the evidence for K > 1, with the standard
    total-derivative reparameterized gradient.  Sticking-the-landing is
    disabled in that case: dropping the score term is only unbiased for the
    K=1 bound (the K>1 fix is DReG, not implemented).
    """
    if iwae and num_particles < 2:
        raise ValueError("iwae=True needs num_particles >= 2")

    def elbo(params, key, subsample=None, model_args=None,
             model_params=None):
        ctx = {"subsample": subsample, "model_args": model_args}
        uparams, logq = guide.sample_and_log_prob(
            params, key, (num_particles,),
            stop_gradient_q=stl and not iwae, ctx=ctx
        )
        logp = jax.vmap(
            lambda u: logdensity(u, subsample=subsample,
                                 model_args=model_args,
                                 params=model_params)
        )(uparams)
        logw = logp - logq
        if iwae:
            return (jax.scipy.special.logsumexp(logw, axis=0)
                    - jnp.log(num_particles))
        return jnp.mean(logw)

    return elbo
