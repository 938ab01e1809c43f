"""Dev probe 5: measure the hier fused potential's evaluation noise on
TPU along a short line in state space, against a float64 CPU oracle.
If pe_f32(q + s*d) - pe_f64(q + s*d) wiggles by O(1), the multinomial /
MH weights are noise-dominated at any step size — the round-5 warmup
lockup mechanism.  Prints the deviation at each point and its spread,
for both mm_dtype=float32 and the 3-pass "split".

Usage: python -m benchmarks._hier_probe5
"""

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")

from bayesic_tpu.models import hier_logistic as hl          # noqa: E402
from bayesic_tpu.ops import fused_nuts_hier as fnh          # noqa: E402


def f64_potential(x, y, group, J, F, q_real):
    """Float64 numpy oracle of the real-lane potential (same density as
    make_hier_potential's real part)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    g = np.asarray(group)
    out = []
    for q in q_real:
        q = np.asarray(q, np.float64)
        mu, u = q[0], q[1]
        theta = q[2:2 + J]
        beta = q[2 + J:2 + J + F]
        tau2 = np.exp(2 * u)
        logits = theta[g] + x @ beta
        sp = np.maximum(logits, 0) + np.log1p(np.exp(-np.abs(logits)))
        lik = np.sum(sp - y * logits)
        pe = (0.5 * mu * mu / 25.0 + 0.125 * tau2 + (J - 1.0) * u
              + 0.5 * np.sum((theta - mu) ** 2) / tau2
              + 0.5 * np.sum(beta ** 2) + lik)
        out.append(pe)
    return np.asarray(out)


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
    qs = np.stack([q0 + s * d for s in ss])           # (26, 128)
    pe64 = f64_potential(x, y, group, J, F, qs[:, :dim])

    for mm in ("float32", "split"):
        pg = fnh.make_hier_potential(a, a_t, y_row, w_row, J, F,
                                     mm_dtype=(jnp.float32
                                               if mm == "float32" else mm))
        pe32 = np.asarray(jax.jit(pg)(jnp.asarray(qs))[0])[:, 0]
        # subtract the pad contribution (zero here: pads of q0 are 0)
        dev = pe32 - pe64
        print(f"mm={mm:8s} dev mean={dev.mean():+.4f} "
              f"sd={dev.std():.4f} min={dev.min():+.4f} "
              f"max={dev.max():+.4f} (pe ~ {pe64.mean():.0f})", flush=True)
        print("   devs:", np.array2string(dev, precision=3), flush=True)


if __name__ == "__main__":
    main()
