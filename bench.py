"""Headline benchmark: ELBO-steps/s/chip on the flagship DLGM
(BASELINE.json metric; SURVEY.md C22).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.json published == {}), so
vs_baseline is reported as 1.0 and this repo's own history (BENCH_r*.json)
is the comparison series.

Runs on whatever platform the environment provides (the driver runs it on
one real TPU chip via the axon tunnel).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import optax

# RBG bit generator: ~25% faster DLGM ELBO steps than threefry on TPU (the
# per-step key folds/normal draws are a real cost at this model size);
# statistically fine for SVI (tests/test_svi.py passes under rbg too).
jax.config.update("jax_default_prng_impl", "rbg")

# Persistent compile cache: the remote-TPU compile service has minutes-level
# latency variance; a warm cache makes bench wall time predictable.
import os as _os

_cache = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                       ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    from bayesic_tpu.models import dlgm
    from bayesic_tpu.infer.svi import SVI

    # TPU-sized flagship config: MXU-heavy encoder/decoder matmuls.
    cfg = dlgm.Config(
        num_data=65_536, data_dim=128, latent_dim=32, hidden=256,
        batch_size=1024, steps=1, seed=0,
    )
    x = dlgm.make_data(cfg)
    model, guide, dec, enc = dlgm.make_model_and_guide(cfg, x)
    svi = SVI(model, guide, optax.adam(1e-3), model_args=(x,))
    state = svi.init(jax.random.PRNGKey(0))

    steps = 500

    # x rides as a traced jit argument, NOT a closure constant (embedded
    # multi-MB constants make remote compiles pathologically slow)
    def run_block(s, xa):
        def body(carry, _):
            new, loss = svi.step(carry, model_args=(xa,))
            return new, loss

        return jax.lax.scan(body, s, None, length=steps)

    run_block = jax.jit(run_block)

    def force(arr):
        # through the remote-TPU relay block_until_ready can return before
        # the computation finishes; a device_get is the reliable fence
        return float(jax.device_get(arr[-1]))

    # compile + warmup (excluded from timing)
    state, losses = run_block(state, x)
    force(losses)

    # best-of-3 with the EVOLVING state threaded through each rep so no
    # layer can serve a repeat of an identical computation
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = run_block(state, x)
        force(losses)
        best = min(best, time.perf_counter() - t0)

    rate = steps / best
    n_chips = jax.device_count()
    rec = {
        "metric": "dlgm_elbo_steps_per_s_per_chip",
        "value": rate / n_chips,
        "unit": "steps/s/chip",
        "vs_baseline": 1.0,
        "platform": jax.devices()[0].platform,
        "n_chips": n_chips,
        "batch": cfg.batch_size,
        "data_dim": cfg.data_dim,
        "hidden": cfg.hidden,
        "final_loss": float(losses[-1]),
    }
    print(json.dumps(rec))


def _main_with_retry():
    """The remote TPU worker occasionally crashes transiently; a crash
    poisons this client process, so retry once in a fresh interpreter."""
    try:
        return main()
    except Exception as e:  # noqa: BLE001
        if "--no-retry" in sys.argv:
            raise
        print(f"bench attempt failed ({type(e).__name__}); retrying in a "
              f"fresh process", file=sys.stderr)
        import os
        import subprocess

        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--no-retry"],
        )
        return proc.returncode


if __name__ == "__main__":
    sys.exit(_main_with_retry())
