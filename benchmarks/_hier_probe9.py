"""Dev probe 9: per-element error of the softplus likelihood terms on
TPU (exact logits in, terms out — no matmul, no reduction).

Usage: python -m benchmarks._hier_probe9
"""

import numpy as np

import jax
import jax.numpy as jnp

from bayesic_tpu.models import hier_logistic as hl          # noqa: E402
from bayesic_tpu.ops import fused_nuts_hier as fnh          # noqa: E402


def main():
    cfg = hl.Config()
    x, y, group, _ = hl.make_data(cfg)
    J, F = cfg.num_groups, cfg.num_features
    a, a_t, y_row, w_row = fnh.build_design(x, y, group, J)
    a64 = np.asarray(a_t, np.float64)

    rng = np.random.default_rng(0)
    q = np.zeros((4, 128), np.float32)
    q[:, :2 + J + F] = rng.normal(0, 0.5, (4, 2 + J + F))
    logits64 = np.asarray(q, np.float64) @ a64
    logits32 = jnp.asarray(logits64.astype(np.float32))
    y64 = np.asarray(y_row, np.float64)
    w64 = np.asarray(w_row, np.float64)
    sp64 = np.maximum(logits64, 0) + np.log1p(np.exp(-np.abs(logits64)))
    terms64 = w64 * (sp64 - y64 * logits64)

    def terms_fn(lg):
        sp = jnp.maximum(lg, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(lg)))
        return w_row * (sp - y_row * lg)

    for devname, dev in (("tpu", jax.devices()[0]),
                         ("cpu", jax.devices("cpu")[0])):
        with jax.default_device(dev):
            t32 = np.asarray(jax.jit(terms_fn)(
                jax.device_put(logits32, dev)), np.float64)
        err = (t32 - terms64)[:, np.asarray(w_row[0]) > 0]
        print(f"{devname}: per-term err max={np.abs(err).max():.3e} "
              f"rms={np.sqrt((err**2).mean()):.3e} "
              f"mean={err.mean():+.3e}", flush=True)
        # where are the largest errors?
        i = np.unravel_index(np.abs(err).argmax(), err.shape)
        print(f"   worst at logit={logits64[i[0], i[1]]:+.4f} "
              f"term64={terms64[i[0], i[1]]:.6f} "
              f"term32={t32[i[0], i[1]]:.6f}", flush=True)


if __name__ == "__main__":
    main()
