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
              iwae=False, dreg=False):
    """Returns ``elbo(params, key, subsample=None) -> scalar`` (a stochastic
    lower bound estimate; maximise it).

    ``iwae=True`` returns the importance-weighted bound
    ``logsumexp_k(log p - log q) - log K`` (Burda et al. 2016) — a strictly
    tighter lower bound on the evidence for K > 1, with the standard
    total-derivative reparameterized gradient.  Sticking-the-landing is
    disabled in that case: dropping the score term is only unbiased for the
    K=1 bound.

    ``dreg=True`` (with ``iwae=True``) switches to the doubly-
    reparameterized gradient (Tucker et al. 2019): guide-parameter
    gradients are path-only with squared normalized weights
    (``Σ w̃²·∂log w/∂z·∂z/∂φ``), model-parameter gradients keep weights
    ``w̃`` — unbiased for the same bound, and the guide-gradient variance
    no longer degrades as K grows (the plain estimator's does).
    """
    if iwae and num_particles < 2:
        raise ValueError("iwae=True needs num_particles >= 2")
    if dreg and not iwae:
        raise ValueError("dreg=True requires iwae=True")

    def elbo(params, key, subsample=None, model_args=None,
             model_params=None):
        ctx = {"subsample": subsample, "model_args": model_args}
        uparams, logq = guide.sample_and_log_prob(
            params, key, (num_particles,),
            stop_gradient_q=(stl and not iwae) or dreg, ctx=ctx
        )

        def lp(u, mp):
            return logdensity(u, subsample=subsample, model_args=model_args,
                              params=mp)

        logp = jax.vmap(lambda u: lp(u, model_params))(uparams)
        logw = logp - logq           # dreg: logq has φ stopped, z-path live
        if iwae and dreg:
            lse = jax.scipy.special.logsumexp
            w_tilde = jax.nn.softmax(jax.lax.stop_gradient(logw), axis=0)
            if model_params is not None:
                # z-path-only copy: θ stopped so the w̃²-w̃ correction term
                # contributes no model-parameter gradient
                logp_sg = jax.vmap(lambda u: lp(
                    u, jax.lax.stop_gradient(model_params)))(uparams)
                logw_path = logp_sg - logq
            else:
                logw_path = logw
            surrogate = jnp.sum(
                jax.lax.stop_gradient(w_tilde) * logw
                + jax.lax.stop_gradient(w_tilde**2 - w_tilde) * logw_path
            )
            value = (lse(jax.lax.stop_gradient(logw), axis=0)
                     - jnp.log(num_particles))
            return value + surrogate - jax.lax.stop_gradient(surrogate)
        if iwae:
            return (jax.scipy.special.logsumexp(logw, axis=0)
                    - jnp.log(num_particles))
        return jnp.mean(logw)

    return elbo
