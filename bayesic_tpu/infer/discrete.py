"""Posterior recovery of enumerated discrete sites (infer_discrete).

Blueprint: SURVEY.md C4 enumeration workflow completion — inference runs on
the marginalised model (NUTS/SVI/SMC never see discrete sites); this module
draws the discrete sites back from their exact conditionals given each
posterior draw of the continuous latents, vectorized over draws.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.logjoint import build_logjoint

__all__ = ["infer_discrete"]


def infer_discrete(model, samples, rng_key, model_args=(),
                   model_kwargs=None):
    """``samples``: dict site -> (S, *event) **constrained** posterior draws
    of the continuous latents (e.g. ``MCMCResult.samples`` reshaped to one
    leading draw axis).  Returns dict enum-site -> (S, *site shape) int
    draws from p(z | theta_s, data), one exact joint conditional draw per
    posterior sample."""
    info, logdensity, _, _ = build_logjoint(
        model, *model_args, **(model_kwargs or {})
    )
    if not info.enum_sites:
        raise ValueError("model has no enumerated discrete sites")
    names = list(info.latent_names)
    missing = [n for n in names if n not in samples]
    if missing:
        raise ValueError(f"samples missing latent sites {missing}")
    num = jnp.shape(samples[names[0]])[0]

    def one(vals, k):
        u = {n: info.transforms[n].inverse(vals[n]) for n in names}
        return logdensity.sample_enum(u, k)

    keys = jax.vmap(lambda i: jax.random.fold_in(rng_key, i))(
        jnp.arange(num))
    vals = {n: jnp.asarray(samples[n]) for n in names}
    return jax.vmap(one)(vals, keys)
