"""Dev probe for the dlgm_nuts_fused bandwidth bound (VERDICT r4 item 4):
times the fused whole-transition kernel at the benchmark shape under
{mm_dtype x block_chains} variants.  NOT a protocol measurement — single
timed loop per variant, used only to pick the harness configuration.

Usage: python -m benchmarks._nuts_probe [--transitions 100]
"""

import argparse
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transitions", type=int, default=100)
    args = ap.parse_args()

    from bayesic_tpu.models import dlgm

    out = dlgm.run_svi(dlgm.Config(num_data=2048, data_dim=32,
                                   latent_dim=8, hidden=64, batch_size=256,
                                   steps=20))
    n_rows = 64
    cfg2 = dlgm.Config(num_data=2048, data_dim=32, latent_dim=8, hidden=64,
                       num_chains=1024, num_warmup=20, num_samples=20)

    for mm_dtype in ("float32", "split"):
        for bc in (32, 64, 128):
            try:
                mcmc = dlgm.local_posterior_mcmc_fused(
                    cfg2, out["decoder"], out["decoder_params"],
                    out["sigma_x"], out["x"][:n_rows],
                    block_chains=bc, mm_dtype=mm_dtype)
                # drive raw transitions through the batched hook: warmup
                # run compiles; then time a fixed transition loop
                t0 = time.perf_counter()
                res = mcmc.run(jax.random.PRNGKey(0))
                jax.block_until_ready(res.unconstrained)
                compile_and_run = time.perf_counter() - t0
                t0 = time.perf_counter()
                res = mcmc.run(jax.random.PRNGKey(1))
                steps = float(jnp.mean(res.extra["num_steps"]))
                _ = float(jnp.sum(res.unconstrained))   # relay-safe fence
                dt = time.perf_counter() - t0
                total_trans = cfg2.num_warmup + cfg2.num_samples
                print(f"mm={mm_dtype:8s} bc={bc:4d} "
                      f"run2={dt:6.2f}s ({total_trans} transitions, "
                      f"mean tree steps {steps:.1f}, "
                      f"{total_trans / dt:.1f} trans/s) "
                      f"[first run incl compile {compile_and_run:.1f}s]",
                      flush=True)
            except Exception as e:  # noqa: BLE001 — probe must survive OOM
                print(f"mm={mm_dtype:8s} bc={bc:4d} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
