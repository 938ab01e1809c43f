"""Dev probe for the hier fused-NUTS bench-shape failure (round 5): the
selftest shape (16 groups / 1.6k obs / 64 chains) passes on TPU but the
bench shape (50 groups / 10k obs / 128 chains) recorded R-hat 35.8 with
every tree running to the 64-leaf cap.  Compare single Mosaic transitions
against interpret mode on identical inputs, one shape variable at a time.

Usage: python -m benchmarks._hier_probe
"""

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

from bayesic_tpu.models import hier_logistic as hl          # noqa: E402
from bayesic_tpu.ops import fused_nuts_hier as fnh          # noqa: E402


def probe(num_groups, obs_per_group, num_features, chains, eps, kk=6):
    cfg = hl.Config(num_groups=num_groups, obs_per_group=obs_per_group,
                    num_features=num_features, seed=0)
    x, y, group, _ = hl.make_data(cfg)
    dim = 2 + num_groups + num_features
    a, a_t, y_row, w_row = fnh.build_design(x, y, group, num_groups)
    pg = fnh.make_hier_potential(a, a_t, y_row, w_row, num_groups,
                                 num_features)
    rng = np.random.default_rng(1)
    q = np.zeros((chains, 128), np.float32)
    q[:, :dim] = rng.normal(0.0, 0.5, (chains, dim))
    q[:, dim:] = rng.normal(0.0, 1.0, (chains, 128 - dim))
    qj = jnp.asarray(q)
    key = jax.random.PRNGKey(2)
    k_m, k_d, k_a, k_l = jax.random.split(key, 4)
    mom = jax.random.normal(k_m, (chains, 128), jnp.float32)
    sd = jnp.where(jax.random.bernoulli(k_d, 0.5, (chains, kk)), 1.0,
                   -1.0).astype(jnp.float32)
    lua = jnp.log(jax.random.uniform(k_a, (chains, kk), jnp.float32,
                                     minval=1e-6))
    lul = jnp.log(jax.random.uniform(k_l, (chains, 1 << kk), jnp.float32,
                                     minval=1e-6))
    inv_mass = jnp.ones((1, 128), jnp.float32)
    outs = {}
    for mode in ("mosaic", "interp"):
        res = fnh.fused_hier_nuts_transition(
            qj, mom, sd, lua, lul, jnp.full((1, 1), eps, jnp.float32),
            inv_mass, a, a_t, y_row, w_row, num_groups=num_groups,
            num_features=num_features, block_chains=chains,
            max_doublings=kk, interpret=(mode == "interp"))
        q2, pe2, g2, acc, div, depth, nsteps, h0 = [np.asarray(o)
                                                    for o in res]
        pe_chk = np.asarray(pg(jnp.asarray(q2))[0])
        outs[mode] = dict(
            acc=float(acc[:, 0].mean()), depth=float(depth[:, 0].mean()),
            nsteps=float(nsteps[:, 0].mean()), div=int(div[:, 0].sum()),
            pe_err=float(np.abs(pe2[:, 0] - pe_chk[:, 0]).max()),
            q2=q2, h0=h0[:, 0].copy(), pe0=None)
    m, i = outs["mosaic"], outs["interp"]
    qgap = float(np.abs(m["q2"] - i["q2"]).max())
    h0gap = float(np.abs(m["h0"] - i["h0"]).max())
    print(f"J={num_groups:3d} n={num_groups*obs_per_group:6d} "
          f"C={chains:3d} eps={eps:<6g} | mosaic acc={m['acc']:.3f} "
          f"depth={m['depth']:4.1f} steps={m['nsteps']:4.1f} "
          f"div={m['div']:3d} pe_err={m['pe_err']:.2e} | interp "
          f"acc={i['acc']:.3f} depth={i['depth']:4.1f} "
          f"steps={i['nsteps']:4.1f} div={i['div']:3d} "
          f"pe_err={i['pe_err']:.2e} | qgap={qgap:.2e} h0gap={h0gap:.2e}",
          flush=True)


if __name__ == "__main__":
    # selftest shape (passes) -> bench shape, one variable at a time
    probe(16, 100, 4, 64, 0.1)
    probe(50, 200, 5, 64, 0.1)      # bench groups/obs, selftest chains
    probe(16, 100, 4, 128, 0.1)     # selftest shape, bench chains
    probe(50, 200, 5, 128, 0.1)     # full bench shape
    probe(50, 200, 5, 128, 0.02)    # smaller eps (post-warmup scale)
    probe(50, 200, 5, 128, 0.3)
