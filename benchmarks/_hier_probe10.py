"""Dev probe 10: candidate likelihood-reduction implementations for the
hier kernel, measured in the FUSED on-device chain (exact logits -> terms
-> reduction) against f64.  Pick the one with the smallest deviation sd
along a state-space line (that sd is MH-accept noise).

Usage: python -m benchmarks._hier_probe10
"""

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from bayesic_tpu.models import hier_logistic as hl          # noqa: E402
from bayesic_tpu.ops import fused_nuts_hier as fnh          # noqa: E402

NT = (((1,), (0,)), ((), ()))


def main():
    cfg = hl.Config()
    x, y, group, _ = hl.make_data(cfg)
    J, F = cfg.num_groups, cfg.num_features
    dim = 2 + J + F
    a, a_t, y_row, w_row = fnh.build_design(x, y, group, J)
    a64 = np.asarray(a_t, np.float64)
    n_obs = int(np.asarray(w_row).sum())

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
    log2 = float(math.log(2.0))

    def terms_of(lg):
        sp = jnp.maximum(lg, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(lg)))
        return w_row * (sp - y_row * lg)

    def dot2(part):
        hi = part.astype(jnp.bfloat16)
        lo = (part - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dd = functools.partial(lax.dot_general, dimension_numbers=NT,
                               preferred_element_type=jnp.float32)
        ob = ones.astype(jnp.bfloat16)
        return dd(hi, ob) + dd(lo, ob)

    def chunks(t):
        return [t[:, g * 128:(g + 1) * 128]
                for g in range(t.shape[1] // 128)]

    def rs_2pass(lg):
        t = terms_of(lg)
        part = t[:, 0:128]
        for c in chunks(t)[1:]:
            part = part + c
        return dot2(part)[:, 0]

    def rs_highest(lg):
        t = terms_of(lg)
        part = t[:, 0:128]
        for c in chunks(t)[1:]:
            part = part + c
        return lax.dot_general(part, ones, NT,
                               preferred_element_type=jnp.float32,
                               precision=lax.Precision.HIGHEST)[:, 0]

    def rs_kahan(lg):
        t = terms_of(lg)
        cs = chunks(t)
        part = cs[0]
        comp = jnp.zeros_like(part)
        for c in cs[1:]:
            yv = c - comp
            tv = part + yv
            comp = (tv - part) - yv
            part = tv
        return (dot2(part) - dot2(comp))[:, 0]

    def rs_centered(lg):
        t = terms_of(lg) - w_row * log2
        part = t[:, 0:128]
        for c in chunks(t)[1:]:
            part = part + c
        return dot2(part)[:, 0] + n_obs * log2

    def rs_centered_kahan(lg):
        t = terms_of(lg) - w_row * log2
        cs = chunks(t)
        part = cs[0]
        comp = jnp.zeros_like(part)
        for c in cs[1:]:
            yv = c - comp
            tv = part + yv
            comp = (tv - part) - yv
            part = tv
        return (dot2(part) - dot2(comp))[:, 0] + n_obs * log2

    variants = {"2pass": rs_2pass, "highest": rs_highest,
                "kahan": rs_kahan, "centered": rs_centered,
                "cent+kahan": rs_centered_kahan}
    for devname, dev in (("tpu", jax.devices()[0]),
                         ("cpu", jax.devices("cpu")[0])):
        for name, fn in variants.items():
            with jax.default_device(dev):
                out = np.asarray(jax.jit(fn)(
                    jax.device_put(logits32, dev)), np.float64)
            e = out - lik64
            print(f"{devname} {name:11s} mean={e.mean():+9.5f} "
                  f"sd={e.std():.5f} "
                  f"step_sd={np.abs(np.diff(e)).mean():.5f}", flush=True)


if __name__ == "__main__":
    main()
