"""Dev probe 3: instrument the hier fused-NUTS warmup at the bench shape
by host-stepping the driver's OWN warm_step (no reimplementation), with
fused vs XLA side by side.  Prints eps / accept / depth / inv_mass range /
cross-chain spread every few steps to localize where adaptation locks up.

Usage: python -m benchmarks._hier_probe3 [--fused 1] [--warmup 200]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

from bayesic_tpu.infer.mcmc import MCMC                     # noqa: E402
from bayesic_tpu.models import hier_logistic as hl          # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fused", type=int, default=1)
    ap.add_argument("--warmup", type=int, default=200)
    ap.add_argument("--chains", type=int, default=128)
    args = ap.parse_args()

    cfg = hl.Config()
    x, y, group, _ = hl.make_data(cfg)
    if args.fused:
        m = hl.fused_nuts_mcmc(
            cfg.num_groups, cfg.num_features, x, y, group,
            num_warmup=args.warmup, num_samples=10,
            num_chains=args.chains, target_accept=0.85)
    else:
        model = hl.make_model(cfg.num_groups, cfg.num_features, None,
                              centered=True)
        m = MCMC(model=model, num_warmup=args.warmup, num_samples=10,
                 num_chains=args.chains, shared_adapt=True,
                 model_args=(x, y, group), target_accept=0.85)

    key = jax.random.PRNGKey(1)
    key_init, key_warm, _ = jax.random.split(key, 3)
    carry = m._initial_carry(key_init)
    warm_step, _ = m._build_steps()
    chunk = 10

    def block(c, t0):
        def body(cc, i):
            cc, acc = warm_step(key_warm, cc, t0 + i)
            return cc, jnp.mean(acc)

        return jax.lax.scan(body, c, jnp.arange(chunk))

    blockj = jax.jit(block)
    for t0 in range(0, args.warmup, chunk):
        carry, accs = blockj(carry, t0)
        eps = float(jnp.exp(carry.da.log_step))
        a = float(jnp.mean(accs))
        im = np.asarray(carry.inv_mass).ravel()
        qs = np.asarray(carry.state.q)
        print(f"t={t0 + chunk - 1:4d} eps={eps:10.3e} acc={a:6.3f} "
              f"invm=[{im.min():8.2e},{im.max():8.2e}] "
              f"q_cross_sd={qs.std(0).mean():7.3f} "
              f"pe_mean={float(jnp.mean(carry.state.pe)):10.1f}",
              flush=True)


if __name__ == "__main__":
    main()
