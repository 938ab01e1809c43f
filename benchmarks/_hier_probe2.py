"""Dev probe 2: hier fused-NUTS full runs at the bench shape — isolate
whether the R-hat 35.8 bench failure comes from run_segmented, the
warmup length, or the pad-lane construction.  Prints R-hat / ESS /
tree-steps / divergence for fused-vs-XLA under both run modes.

Usage: python -m benchmarks._hier_probe2
"""

import time

import jax
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

from bayesic_tpu.infer.mcmc import MCMC                     # noqa: E402
from bayesic_tpu.models import hier_logistic as hl          # noqa: E402
from bayesic_tpu.utils import diagnostics as diag           # noqa: E402


def report(tag, res, dt):
    qs = np.asarray(res.unconstrained)
    rhat = float(np.asarray(diag.split_rhat(res.unconstrained)).max())
    ess = float(np.asarray(diag.ess(res.unconstrained)).min())
    steps = float(np.asarray(res.extra["num_steps"]).mean())
    div = int(np.asarray(res.extra["diverging"]).sum())
    print(f"{tag:28s} rhat={rhat:8.3f} min_ess={ess:9.1f} "
          f"steps={steps:5.1f} div={div:4d} wall={dt:6.1f}s "
          f"q_sd={qs.std():.3f}", flush=True)


def main():
    import sys
    kk = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    cfg = hl.Config()
    x, y, group, _ = hl.make_data(cfg)
    chains, warm, samp = 128, 500, 300

    def xla():
        model = hl.make_model(cfg.num_groups, cfg.num_features, None,
                              centered=True)
        return MCMC(model=model, num_warmup=warm, num_samples=samp,
                    num_chains=chains, shared_adapt=True,
                    model_args=(x, y, group), target_accept=0.85)

    def fused():
        return hl.fused_nuts_mcmc(
            cfg.num_groups, cfg.num_features, x, y, group,
            num_warmup=warm, num_samples=samp, num_chains=chains,
            target_accept=0.85, max_doublings=kk)

    for tag, mk in (("fused run", fused),):
        m = mk()
        t0 = time.perf_counter()
        if "segmented" in tag:
            res = m.run_segmented(jax.random.PRNGKey(1), warmup_chunk=125,
                                  sample_chunk=150)
        else:
            res = m.run(jax.random.PRNGKey(1))
        jax.block_until_ready(res.unconstrained)
        report(tag, res, time.perf_counter() - t0)


if __name__ == "__main__":
    main()
