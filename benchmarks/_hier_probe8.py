"""Dev probe 8: isolate which stage of lik(q) carries the TPU noise.
(a) terms(logits)->rowsum from FIXED exact logits (elementwise
transcendentals + rowsum, no matmul); (b) the full logits->lik chain per
mm mode.  All vs f64, TPU vs CPU.

Usage: python -m benchmarks._hier_probe8
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from bayesic_tpu.models import hier_logistic as hl          # noqa: E402
from bayesic_tpu.ops import fused_nuts_hier as fnh          # noqa: E402
from bayesic_tpu.ops.fused_nuts import (_rowsum_tile,       # noqa: E402
                                        _make_mms)

NT = (((1,), (0,)), ((), ()))


def main():
    cfg = hl.Config()
    x, y, group, _ = hl.make_data(cfg)
    J, F = cfg.num_groups, cfg.num_features
    dim = 2 + J + F
    a, a_t, y_row, w_row = fnh.build_design(x, y, group, J)
    a64 = np.asarray(a_t, np.float64)

    rng = np.random.default_rng(0)
    q0 = np.zeros(128, np.float32)
    q0[:dim] = rng.normal(0, 0.5, dim)
    d = rng.normal(0, 1, 128).astype(np.float32)
    d[dim:] = 0.0
    d /= np.linalg.norm(d)
    ss = np.linspace(0.0, 0.05, 26, dtype=np.float32)
    qs = np.stack([q0 + s * d for s in ss])

    logits64 = np.asarray(qs, np.float64) @ a64
    logits32 = jnp.asarray(logits64.astype(np.float32))
    y64 = np.asarray(y_row, np.float64)
    w64 = np.asarray(w_row, np.float64)
    sp64 = np.maximum(logits64, 0) + np.log1p(np.exp(-np.abs(logits64)))
    lik64 = (w64 * (sp64 - y64 * logits64)).sum(axis=1)

    ones = jnp.ones((128, 128), jnp.float32)

    def terms_rowsum(lg):
        sp = jnp.maximum(lg, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(lg)))
        terms = w_row * (sp - y_row * lg)
        return _rowsum_tile(terms, ones)[:, 0]

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    for devname, dev in (("tpu", tpu), ("cpu", cpu)):
        with jax.default_device(dev):
            out = np.asarray(jax.jit(terms_rowsum)(
                jax.device_put(logits32, dev)))
        e = out - lik64
        print(f"(a) terms+rowsum {devname}: mean={e.mean():+8.4f} "
              f"sd={e.std():.5f}", flush=True)

    for mm in ("float32", "split"):
        val_mm, _ = _make_mms(jnp.float32 if mm == "float32" else mm)

        def lik_chain(q):
            lg = val_mm(q, a_t)
            sp = jnp.maximum(lg, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(lg)))
            terms = w_row * (sp - y_row * lg)
            return _rowsum_tile(terms, ones)[:, 0]

        for devname, dev in (("tpu", tpu), ("cpu", cpu)):
            with jax.default_device(dev):
                out = np.asarray(jax.jit(lik_chain)(
                    jax.device_put(jnp.asarray(qs), dev)))
            e = out - lik64
            print(f"(b) lik {mm:8s} {devname}: mean={e.mean():+8.4f} "
                  f"sd={e.std():.5f}", flush=True)


if __name__ == "__main__":
    main()
