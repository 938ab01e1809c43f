"""Dev probe 4: at the trapped warmup state (eps ~3e-6), which chains
drag the fused accept statistic below target, and why?  Prints per-chain
accept quantiles, u_tau, pe, and gradient magnitudes.

Usage: python -m benchmarks._hier_probe4
"""

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

from bayesic_tpu.models import hier_logistic as hl          # noqa: E402


def main():
    cfg = hl.Config()
    x, y, group, _ = hl.make_data(cfg)
    m = hl.fused_nuts_mcmc(
        cfg.num_groups, cfg.num_features, x, y, group,
        num_warmup=40, num_samples=10, num_chains=128, target_accept=0.85)
    key = jax.random.PRNGKey(1)
    key_init, key_warm, _ = jax.random.split(key, 3)
    carry = m._initial_carry(key_init)
    warm_step, _ = m._build_steps()

    def block(c, t0):
        def body(cc, i):
            cc, acc = warm_step(key_warm, cc, t0 + i)
            return cc, jnp.mean(acc)

        return jax.lax.scan(body, c, jnp.arange(10))

    blockj = jax.jit(block)
    for t0 in range(0, 40, 10):
        carry, _ = blockj(carry, t0)

    eps = jnp.exp(carry.da.log_step)
    print("trapped eps =", float(eps), flush=True)

    # one more transition at the trapped eps, inspect per-chain info
    bt = m.batched_transition
    st, info = jax.jit(bt)(jax.random.PRNGKey(99), carry.state, eps,
                           carry.inv_mass)
    acc = np.asarray(info.accept_prob)
    div = np.asarray(info.diverging)
    dep = np.asarray(info.depth)
    q = np.asarray(carry.state.q)
    from bayesic_tpu.ops import fused_nuts_hier as fnh
    a, a_t, y_row, w_row = fnh.build_design(x, y, group, cfg.num_groups)
    pg = fnh.make_hier_potential(a, a_t, y_row, w_row, cfg.num_groups,
                                 cfg.num_features)
    q128 = np.zeros((128, 128), np.float32)
    q128[:, :q.shape[1]] = q
    pe, g = pg(jnp.asarray(q128))
    pe = np.asarray(pe)[:, 0]
    gmax = np.abs(np.asarray(g)).max(axis=1)

    order = np.argsort(acc)
    print("acc quantiles:", np.percentile(acc, [0, 5, 10, 25, 50, 90]),
          flush=True)
    print("divergences:", int(div.sum()), "depth mean:", dep.mean())
    print("worst 10 chains (acc | u_tau | pe | max|grad|):")
    for i in order[:10]:
        print(f"  {acc[i]:8.4f} | {q[i, 1]:7.3f} | {pe[i]:10.1f} | "
              f"{gmax[i]:10.1f}")
    print("best 3:")
    for i in order[-3:]:
        print(f"  {acc[i]:8.4f} | {q[i, 1]:7.3f} | {pe[i]:10.1f} | "
              f"{gmax[i]:10.1f}")


if __name__ == "__main__":
    main()
