"""Dev probe 6: decompose the hier potential's TPU deviation into its
two stages — (a) the logits matmul (C,128)@(128,Npad) under DEFAULT /
HIGHEST / 3-pass-split, vs f64; (b) the 10k-term row sum of EXACT
host-computed terms under single-DEFAULT-dot / single-HIGHEST-dot /
2-pass-split rowsum, vs f64.

Usage: python -m benchmarks._hier_probe6
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from bayesic_tpu.models import hier_logistic as hl          # noqa: E402
from bayesic_tpu.ops import fused_nuts_hier as fnh          # noqa: E402

NT = (((1,), (0,)), ((), ()))


def dot3x(a, b):
    a_hi = a.astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    d = functools.partial(lax.dot_general, dimension_numbers=NT,
                          preferred_element_type=jnp.float32)
    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def main():
    cfg = hl.Config()
    x, y, group, _ = hl.make_data(cfg)
    J, F = cfg.num_groups, cfg.num_features
    a, a_t, y_row, w_row = fnh.build_design(x, y, group, J)
    a64 = np.asarray(a_t, np.float64)

    rng = np.random.default_rng(0)
    q = np.zeros((8, 128), np.float32)
    q[:, :2 + J + F] = rng.normal(0, 0.5, (8, 2 + J + F))
    q64 = np.asarray(q, np.float64)
    logits64 = q64 @ a64

    qj = jnp.asarray(q)

    def logits_mode(mode):
        if mode == "default":
            return lax.dot_general(qj, a_t, NT,
                                   preferred_element_type=jnp.float32)
        if mode == "highest":
            return lax.dot_general(qj, a_t, NT,
                                   preferred_element_type=jnp.float32,
                                   precision=lax.Precision.HIGHEST)
        return dot3x(qj, a_t)

    for mode in ("default", "highest", "3x"):
        lg = np.asarray(jax.jit(logits_mode, static_argnums=0)(mode))
        err = np.abs(lg - logits64)
        print(f"logits {mode:8s} max_err={err.max():.3e} "
              f"rms={np.sqrt((err**2).mean()):.3e}", flush=True)

    # stage (b): row sums of exact f32 terms
    w_np = np.asarray(w_row, np.float64)
    sp64 = (np.maximum(logits64, 0)
            + np.log1p(np.exp(-np.abs(logits64))))
    terms64 = w_np * (sp64 - np.asarray(y_row, np.float64) * logits64)
    terms32 = jnp.asarray(terms64.astype(np.float32))
    ref = terms64.astype(np.float32).astype(np.float64).sum(axis=1)

    ones = jnp.ones((128, 128), jnp.float32)

    def rowsum_mode(mode):
        t = terms32
        part = t[:, 0:128]
        for g in range(1, t.shape[1] // 128):
            part = part + t[:, g * 128:(g + 1) * 128]
        if mode == "default":
            return lax.dot_general(part, ones, NT,
                                   preferred_element_type=jnp.float32)
        if mode == "highest":
            return lax.dot_general(part, ones, NT,
                                   preferred_element_type=jnp.float32,
                                   precision=lax.Precision.HIGHEST)
        hi = part.astype(jnp.bfloat16)
        lo = (part - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        d = functools.partial(lax.dot_general, dimension_numbers=NT,
                              preferred_element_type=jnp.float32)
        return d(hi, ones.astype(jnp.bfloat16)) \
            + d(lo, ones.astype(jnp.bfloat16))

    for mode in ("default", "highest", "2pass"):
        rs = np.asarray(jax.jit(rowsum_mode, static_argnums=0)(mode))[:, 0]
        err = np.abs(rs - ref)
        print(f"rowsum {mode:8s} max_err={err.max():.3e} "
              f"(sum ~ {ref.mean():.0f})", flush=True)


if __name__ == "__main__":
    main()
