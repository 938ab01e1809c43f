"""Round-5 follow-up to _nuts_probe: (a) best-of-3 confirmation of the
block_chains=64 win under mm_dtype='split' after the 100 MB VMEM cap
raise, (b) reproduce the float32-path Mosaic compile failure with the
full error text.  NOT a protocol measurement.

Usage: python -m benchmarks._nuts_probe2b [--reps 3]
"""

import argparse
import time
import traceback

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from bayesic_tpu.models import dlgm

    out = dlgm.run_svi(dlgm.Config(num_data=2048, data_dim=32,
                                   latent_dim=8, hidden=64, batch_size=256,
                                   steps=20))
    n_rows = 64
    cfg2 = dlgm.Config(num_data=2048, data_dim=32, latent_dim=8, hidden=64,
                       num_chains=1024, num_warmup=20, num_samples=20)
    total_trans = cfg2.num_warmup + cfg2.num_samples

    for mm_dtype, bc in (("split", 32), ("split", 64), ("split", 128),
                         ("float32", 32)):
        try:
            mcmc = dlgm.local_posterior_mcmc_fused(
                cfg2, out["decoder"], out["decoder_params"],
                out["sigma_x"], out["x"][:n_rows],
                block_chains=bc, mm_dtype=mm_dtype)
            res = mcmc.run(jax.random.PRNGKey(0))     # compile
            _ = float(jnp.sum(res.unconstrained))
            best = float("inf")
            for r in range(args.reps):
                t0 = time.perf_counter()
                res = mcmc.run(jax.random.PRNGKey(1 + r))
                _ = float(jnp.sum(res.unconstrained))  # relay-safe fence
                best = min(best, time.perf_counter() - t0)
            steps = float(jnp.mean(res.extra["num_steps"]))
            print(f"mm={mm_dtype:8s} bc={bc:4d} best-of-{args.reps} "
                  f"{best:6.2f}s ({total_trans} transitions, mean tree "
                  f"steps {steps:.1f}, {total_trans / best:.1f} trans/s)",
                  flush=True)
        except Exception:  # noqa: BLE001 — probe must record the failure
            print(f"mm={mm_dtype:8s} bc={bc:4d} FAILED:", flush=True)
            traceback.print_exc()


if __name__ == "__main__":
    main()
