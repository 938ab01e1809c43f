"""Throwaway: compile + time the fused DLGM trainer on the real chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from bayesic_tpu.models import dlgm
from bayesic_tpu.ops import fused_vae as fv


def bench(cfg, gather, steps):
    key = jax.random.PRNGKey(0)
    x = dlgm.make_data(cfg)
    if gather == "block":
        x = x[jax.random.permutation(jax.random.fold_in(key, 8),
                                     cfg.num_data)]
    params, m, v = dlgm.fused_init(cfg, key)
    t0 = time.perf_counter()
    p, m, v, losses = fv.fused_train(
        x, params, m, v, steps=steps, lr=cfg.lr, seed=1,
        batch=cfg.batch_size, gather=gather)
    float(losses[-1]); float(np.asarray(p["usig"])[0, 0])
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    times = []
    tt = 0
    for r in range(4):
        t0 = time.perf_counter()
        p, m, v, losses = fv.fused_train(
            x, p, m, v, steps=steps, lr=cfg.lr, seed=2 + r,
            batch=cfg.batch_size, gather=gather, t0=tt)
        float(losses[-1]); float(np.asarray(p["usig"])[0, 0])
        times.append(time.perf_counter() - t0)
        tt += steps
    med = float(np.median(times))
    print(f"{gather}: {steps / med:.0f} steps/s  times="
          f"{[round(t, 3) for t in times]}  "
          f"final_loss={float(losses[-1]):.1f} "
          f"sigma_x={float(np.exp(np.asarray(p['usig'])[0, 0])):.3f}",
          flush=True)


if __name__ == "__main__":
    small = dlgm.Config()                      # 10k x 32, B=256
    big = dlgm.Config(num_data=65_536, data_dim=128, latent_dim=32,
                      hidden=256, batch_size=1024)
    try:
        bench(small, "onehot", 20_000)
    except Exception as e:
        print("onehot FAILED:", repr(e)[:800])
    try:
        bench(big, "block", 20_000)
    except Exception as e:
        print("block FAILED:", repr(e)[:800])
