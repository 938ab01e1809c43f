"""Reparameterizers: rewrite latent sites into better-conditioned forms.

Blueprint: SURVEY.md C8/§7 periphery — hierarchical posteriors (8-schools,
configs[1]) need non-centered parameterization for NUTS to mix; instead of
forcing users to hand-write ``theta = mu + tau * theta_raw``, the ``reparam``
handler rewrites selected sites automatically (the composable-effects
counterpart of NumPyro's reparameterizers, implemented from scratch).

Usage::

    model_nc = reparam(model, config={"theta": LocScaleReparam()})
    MCMC(model=model_nc, ...).run(key)

The rewritten site becomes a ``deterministic`` record (still visible in
postprocess/Predictive); a new latent ``{name}_decentered`` site carries the
density.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..dist.distribution import Independent
from .handlers import Handler
from .primitives import sample as _sample

__all__ = ["Reparam", "LocScaleReparam", "reparam"]


class Reparam:
    """Interface: ``apply(name, dist) -> value``.  May call the DSL
    primitives to introduce new latent sites; the original site itself is
    recorded as deterministic by the ``reparam`` handler."""

    def apply(self, name, d):
        raise NotImplementedError


def _split_loc_scale(d):
    """(inner loc-scale dist, independent_ndims), seeing through Independent
    wrappers; raises if the family has no loc/scale."""
    ndims = 0
    while isinstance(d, Independent):
        ndims += d.ndims
        d = d.base_dist
    if not (hasattr(d, "loc") and hasattr(d, "scale")):
        raise ValueError(
            f"LocScaleReparam needs a loc/scale family, got {type(d).__name__}"
        )
    return d, ndims


def _with_loc_scale(d, new_loc, new_scale):
    """Copy of a loc-scale distribution with replaced loc/scale, broadcast to
    the original batch shape (keeps other params, e.g. StudentT df)."""
    new = object.__new__(type(d))
    for k, v in d.__dict__.items():
        object.__setattr__(new, k, v)
    object.__setattr__(
        new, "loc", jnp.broadcast_to(new_loc, jnp.shape(d.loc))
    )
    object.__setattr__(
        new, "scale", jnp.broadcast_to(new_scale, jnp.shape(d.scale))
    )
    return new


class LocScaleReparam(Reparam):
    """Non-centering: ``x ~ F(loc, scale)`` becomes
    ``x_decentered ~ F(c*loc, scale^c);  x = (1-c)*loc + scale^(1-c) *
    x_decentered`` with ``centered`` c in [0, 1] (0 = fully non-centered,
    the default; 1 = no-op)."""

    def __init__(self, centered=0.0):
        self.centered = float(centered)

    def apply(self, name, d):
        inner, ndims = _split_loc_scale(d)
        loc, scale = inner.loc, inner.scale
        c = self.centered
        base = _with_loc_scale(
            inner,
            jnp.asarray(c * jnp.asarray(loc)),
            jnp.asarray(scale) ** c if c else jnp.ones_like(
                jnp.asarray(scale)
            ),
        )
        if ndims:
            base = Independent(base, ndims)
        raw = _sample(f"{name}_decentered", base)
        if c:
            return (1.0 - c) * loc + jnp.asarray(scale) ** (1.0 - c) * raw
        return loc + scale * raw


class reparam(Handler):
    """Handler applying ``config`` (site name -> Reparam) to sample sites."""

    def __init__(self, fn=None, config=None):
        super().__init__(fn)
        self.config = config or {}

    def process_message(self, msg):
        if (
            msg["type"] == "sample"
            and not msg["is_observed"]
            and msg["value"] is None
            and msg["name"] in self.config
        ):
            rp = self.config[msg["name"]]
            # run the rewrite (the decentered site goes through the full
            # stack), then neutralise this site into a deterministic record
            # NOTE: wrap the model directly (reparam innermost) so this
            # runs before seed/substitute; the message continues through the
            # outer handlers as a deterministic record (trace keeps it).
            msg["value"] = rp.apply(msg["name"], msg["dist"])
            msg["type"] = "deterministic"
