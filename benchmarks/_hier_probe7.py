"""Dev probe 7: evaluate the ACTUAL make_hier_potential pg on TPU vs CPU
on identical inputs, for both mm_dtype modes, and ALSO compare against
the f64 oracle — localizes whether the probe5 wiggle is TPU-specific and
which sub-expression carries it.

Usage: python -m benchmarks._hier_probe7
"""

import numpy as np

import jax
import jax.numpy as jnp

from bayesic_tpu.models import hier_logistic as hl          # noqa: E402
from bayesic_tpu.ops import fused_nuts_hier as fnh          # noqa: E402
from benchmarks._hier_probe5 import f64_potential           # noqa: E402


def main():
    cfg = hl.Config()
    x, y, group, _ = hl.make_data(cfg)
    J, F = cfg.num_groups, cfg.num_features
    dim = 2 + J + F
    a, a_t, y_row, w_row = fnh.build_design(x, y, group, J)

    rng = np.random.default_rng(0)
    q0 = np.zeros(128, np.float32)
    q0[:dim] = rng.normal(0, 0.5, dim)
    d = rng.normal(0, 1, 128).astype(np.float32)
    d[dim:] = 0.0
    d /= np.linalg.norm(d)
    ss = np.linspace(0.0, 0.05, 26, dtype=np.float32)
    qs = np.stack([q0 + s * d for s in ss])
    pe64 = f64_potential(x, y, group, J, F, qs[:, :dim])

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]

    for mm in ("float32", "split"):
        pg = fnh.make_hier_potential(a, a_t, y_row, w_row, J, F,
                                     mm_dtype=(jnp.float32
                                               if mm == "float32" else mm))
        for devname, dev in (("tpu", tpu), ("cpu", cpu)):
            args = jax.device_put(jnp.asarray(qs), dev)
            with jax.default_device(dev):
                pe = np.asarray(jax.jit(pg)(args)[0])[:, 0]
            dev_err = pe - pe64
            print(f"mm={mm:8s} dev={devname} mean={dev_err.mean():+9.4f} "
                  f"sd={dev_err.std():.5f} "
                  f"range=[{dev_err.min():+8.4f},{dev_err.max():+8.4f}]",
                  flush=True)


if __name__ == "__main__":
    main()
