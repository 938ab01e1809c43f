"""Shared in-kernel helpers for the whole-run fused Pallas trainers
(fused_vae / fused_hier / fused_linreg) — one copy of the on-core PRNG
recipe and the per-leaf Adam update so a numerics fix lands everywhere."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["kernel_uniform", "kernel_normal", "adam_leaf"]


def kernel_uniform(shape):
    """U[0,1) from the TPU core PRNG (24 mantissa bits)."""
    from jax.experimental.pallas import tpu as pltpu

    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (
        1.0 / (1 << 24))


def kernel_normal(shape):
    """Box-Muller from two uniform draws (u1 kept off zero)."""
    u1 = jnp.maximum(kernel_uniform(shape), 1e-7)
    u2 = kernel_uniform(shape)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos((2.0 * np.pi) * u2)


def adam_leaf(p, m, v, g, t, lr, b1=0.9, b2=0.999, eps=1e-8):
    """optax.adam update for ONE leaf on loss = -elbo (g is d elbo, so
    descend on -g).  b^t as exp(t ln b): Mosaic has no powf lowering."""
    bc1 = 1.0 - jnp.exp(t * float(np.log(b1)))
    bc2 = 1.0 - jnp.exp(t * float(np.log(b2)))
    g = -g
    m = b1 * m + (1.0 - b1) * g
    v = b2 * v + (1.0 - b2) * g * g
    upd = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
    return p - lr * upd, m, v
