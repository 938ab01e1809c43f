"""Protocol re-measurement of the dlgm_nuts_fused record after the
round-5 block_chains=32 -> 64 change (benchmarks/_nuts_probe2b.py:
1.51x on raw transitions/s).  Runs EXACTLY the harness's workload —
same config, driver, adaptation, R-hat gate, capped-ESS companion,
pinned fastest-5 protocol — and prints the record JSON.

Usage: python -m benchmarks._rebench_dlgm_nuts_fused [max_doublings]

The optional max_doublings arg (default 6, the bench configuration)
exists to probe the straggler-cost/ESS trade of capped tree depth: the
ess/s metric under the R-hat gate prices any quality loss honestly.
"""

import json
import sys

import jax

from benchmarks import roofline
from benchmarks.harness import _steps, bench_nuts_ess


def main():
    from bayesic_tpu.models import dlgm
    from bayesic_tpu.models.dlgm import local_posterior_mcmc_fused

    out = dlgm.run_svi(dlgm.Config(num_data=2048, data_dim=32,
                                   latent_dim=8, hidden=64, batch_size=256,
                                   steps=_steps(200)))
    n_chains, n_rows = 1024, 64
    cfg2 = dlgm.Config(num_data=2048, data_dim=32, latent_dim=8, hidden=64,
                       num_chains=n_chains, num_warmup=_steps(200),
                       num_samples=_steps(200))
    kk = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    mcmc3 = local_posterior_mcmc_fused(
        cfg2, out["decoder"], out["decoder_params"], out["sigma_x"],
        out["x"][:n_rows], block_chains=64, mm_dtype="split",
        max_doublings=kk)
    rec = bench_nuts_ess(
        "dlgm_nuts_fused", mcmc3, jax.random.PRNGKey(2),
        cost_per_leapfrog=roofline.dlgm_nuts_leapfrog(
            n_rows, cfg2.latent_dim, cfg2.hidden, cfg2.data_dim,
            n_chains))
    print(json.dumps(rec, indent=1, default=float), flush=True)


if __name__ == "__main__":
    main()
