"""Benchmark harness (SURVEY.md C22): per-model throughput + multi-device
scaling efficiency, BASELINE-comparable JSON records.

Metrics (BASELINE.json `metric`):
  * ELBO-steps/s/chip  — SVI workloads (linreg, hier_logistic, matrix_fact,
    dlgm)
  * effective-samples/s/chip — NUTS workloads (hier_logistic, dlgm local
    posterior)
  * particle-stages/s/chip — SMC (gmm)
  * scaling efficiency = rate(N devices) / (N × rate(1 device)), measured on
    whatever devices the platform offers (real pod, or the virtual CPU mesh
    for rehearsal — SURVEY.md §4.5).

Usage:
  python -m benchmarks.harness --model dlgm
  python -m benchmarks.harness --model all --out benchmarks/results.json
  python -m benchmarks.harness --model scaling   (multi-device DP-SVI)
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# rbg bit generator: measurably faster per-step RNG on TPU (bench.py notes);
# correctness under rbg covered in tests/test_svi.py
jax.config.update("jax_default_prng_impl", "rbg")


def _force(out):
    """Materialize on host: through the remote-TPU relay,
    block_until_ready can return before compute finishes; device_get is the
    only reliable fence."""
    return jax.tree_util.tree_map(
        lambda a: np.asarray(jax.device_get(a)).ravel()[:1], out
    )


def _timed(fn, *args, reps=3):
    out = fn(*args)
    _force(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _force(out)
        best = min(best, time.perf_counter() - t0)
    return out, best


def _record(name, metric, value, unit, **extra):
    rec = {"model": name, "metric": metric, "value": float(value),
           "unit": unit, "platform": jax.default_backend(),
           "n_devices": jax.device_count()}
    rec.update(extra)
    print(json.dumps(rec), flush=True)
    return rec


def bench_svi(name, svi, key, steps, model_args=None):
    state = svi.init(key)

    # data rides as a traced jit argument, NOT a closure constant — embedded
    # multi-MB constants make remote compiles pathologically slow
    def block(s, margs):
        def body(c, _):
            new, loss = svi.step(c, model_args=margs)
            return new, loss

        return jax.lax.scan(body, s, None, length=steps)

    blk = jax.jit(block)
    # warmup/compile; then time reps with the EVOLVING state threaded
    # through (identical inputs can be served from an execution cache by
    # the remote runtime, which would fake the rate)
    state, losses = blk(state, model_args)
    _force(losses)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = blk(state, model_args)
        _force(losses)
        dt = min(dt, time.perf_counter() - t0)
    return _record(name, "elbo_steps_per_s_per_chip", steps / dt /
                   jax.device_count(), "steps/s/chip", steps=steps,
                   final_loss=float(losses[-1]))


def bench_nuts_ess(name, mcmc, key):
    from bayesic_tpu.utils import diagnostics as diag

    run_all = jax.jit(mcmc.warmup_and_sample(key))
    out, dt = _timed(run_all, reps=1)
    qs = out[0]                     # (num_samples, chains, dim)
    qs = jnp.swapaxes(qs, 0, 1)
    ess = diag.ess(qs)              # per-dim
    total_min_ess = float(jnp.min(ess))
    return _record(name, "ess_per_s_per_chip",
                   total_min_ess / dt / jax.device_count(), "ess/s/chip",
                   min_ess=total_min_ess, wall_s=dt,
                   chains=int(qs.shape[0]), samples=int(qs.shape[1]))


def run_linreg():
    import optax

    from bayesic_tpu.infer.svi import SVI, MeanFieldGuide
    from bayesic_tpu.models import linreg

    cfg = linreg.Config(n=16384, dim=64)
    x, y, *_ = linreg.make_data(cfg)
    svi = SVI(linreg.model, MeanFieldGuide, optax.adam(0.05),
              model_args=(x, y, cfg.noise))
    return [bench_svi("linreg", svi, jax.random.PRNGKey(0), 500,
                      model_args=(x, y, cfg.noise))]


def run_hier_logistic():
    import optax

    from bayesic_tpu.infer.mcmc import MCMC
    from bayesic_tpu.infer.svi import SVI, MeanFieldGuide
    from bayesic_tpu.models import hier_logistic as hl

    cfg = hl.Config()
    x, y, group, _ = hl.make_data(cfg)
    model = hl.make_model(cfg.num_groups, cfg.num_features, cfg.batch_size)
    svi = SVI(model, MeanFieldGuide, optax.adam(0.03),
              model_args=(x, y, group))
    recs = [bench_svi("hier_logistic", svi, jax.random.PRNGKey(0), 500,
                      model_args=(x, y, group))]

    full = hl.make_model(cfg.num_groups, cfg.num_features, None)
    # 200/200 x 128 chains: the 400-step variant reproducibly faults the
    # remote TPU worker (kernel fault in the long while_loop program)
    mcmc = MCMC(model=full, num_warmup=200, num_samples=200,
                num_chains=128, shared_adapt=True,
                model_args=(x, y, group), target_accept=0.85)
    recs.append(bench_nuts_ess("hier_logistic_nuts", mcmc,
                               jax.random.PRNGKey(1)))
    return recs


def run_matrix_fact():
    import optax

    from bayesic_tpu.infer.svi import SVI, MeanFieldGuide
    from bayesic_tpu.models import matrix_fact as mf

    cfg = mf.Config()
    users, items, ratings, _ = mf.make_data(cfg)
    model = mf.make_model(cfg)
    svi = SVI(model, MeanFieldGuide,
              optax.adam(0.02), model_args=(users, items, ratings))
    return [bench_svi("matrix_fact", svi, jax.random.PRNGKey(0), 200,
                      model_args=(users, items, ratings))]


def run_gmm():
    from bayesic_tpu.models import gmm

    cfg = gmm.Config(num_particles=8192, num_data=2000)
    x, _ = gmm.make_data(cfg)
    model = gmm.make_model(cfg, x)
    from bayesic_tpu.infer.smc import SMC

    def make(use_pallas):
        bl = None
        if use_pallas:
            probe = SMC(model, num_particles=cfg.num_particles)
            bl = gmm.make_batched_loglik(probe.info, probe._unravel, x)
        return SMC(model, num_particles=cfg.num_particles,
                   mutation_steps=cfg.mutation_steps,
                   hmc_leapfrog_steps=cfg.leapfrog_steps,
                   batched_loglik=bl)

    recs = []
    for use_pallas in ([False, True] if jax.default_backend() == "tpu"
                       else [False]):
        smc = make(use_pallas)
        res, dt = _timed(lambda: smc.run(jax.random.PRNGKey(0)), reps=1)
        stages = int(res.num_stages)
        recs.append(_record(
            "gmm_smc" + ("_pallas" if use_pallas else ""),
            "particle_stages_per_s_per_chip",
            cfg.num_particles * stages / dt / jax.device_count(),
            "particle-stages/s/chip", stages=stages, wall_s=dt,
        ))
    return recs


def run_dlgm():
    import optax

    from bayesic_tpu.infer.svi import SVI
    from bayesic_tpu.models import dlgm

    cfg = dlgm.Config(num_data=65_536, data_dim=128, latent_dim=32,
                      hidden=256, batch_size=1024)
    x = dlgm.make_data(cfg)
    model, guide, dec, enc = dlgm.make_model_and_guide(cfg, x)
    svi = SVI(model, guide, optax.adam(1e-3), model_args=(x,))
    recs = [bench_svi("dlgm", svi, jax.random.PRNGKey(0), 500,
                      model_args=(x,))]

    # the 1024-sharded-chain NUTS variant (configs[4]) with pooled
    # cross-chain adaptation
    out = dlgm.run_svi(dlgm.Config(num_data=2048, data_dim=32,
                                   latent_dim=8, hidden=64, batch_size=256,
                                   steps=200))
    n_chains = 1024
    from bayesic_tpu.models.dlgm import local_posterior_mcmc

    cfg2 = dlgm.Config(num_data=2048, data_dim=32, latent_dim=8, hidden=64,
                       num_chains=n_chains, num_warmup=200, num_samples=200)

    def runner():
        m, res = local_posterior_mcmc(
            cfg2, out["decoder"], out["decoder_params"], out["sigma_x"],
            out["x"][:4], jax.random.PRNGKey(2),
        )
        return res.unconstrained

    qs, dt = _timed(runner, reps=1)
    from bayesic_tpu.utils import diagnostics as diag

    ess = float(jnp.min(diag.ess(qs.reshape(qs.shape[0], qs.shape[1], -1))))
    recs.append(_record("dlgm_nuts", "ess_per_s_per_chip",
                        ess / dt / jax.device_count(), "ess/s/chip",
                        chains=n_chains, min_ess=ess, wall_s=dt))
    return recs


def run_scaling():
    """DP-SVI scaling efficiency over the available devices (C22)."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bayesic_tpu.infer.svi import SVI
    from bayesic_tpu.models import dlgm
    from bayesic_tpu.parallel import make_mesh

    n_dev = jax.device_count()
    if n_dev < 2:
        print(json.dumps({"model": "scaling", "skipped":
                          "single device"}))
        return []

    cfg = dlgm.Config(num_data=4096 * n_dev, data_dim=64, latent_dim=16,
                      hidden=128, batch_size=256 * n_dev)
    x = dlgm.make_data(cfg)
    model, guide, dec, enc = dlgm.make_model_and_guide(cfg, x)
    svi = SVI(model, guide, optax.adam(1e-3), model_args=(x,))

    def rate_with(devs):
        mesh = make_mesh({"data": len(devs)}, devices=devs)
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        state = svi.init(jax.random.PRNGKey(0))
        state = jax.device_put(
            state, NamedSharding(mesh, P())
        )

        def block(s):
            def body(c, _):
                new, loss = svi.step(c, model_args=(xs,))
                return new, loss

            return jax.lax.scan(body, s, None, length=100)

        _, dt = _timed(jax.jit(block), state)
        return 100 / dt

    r1 = rate_with(jax.devices()[:1])
    rn = rate_with(jax.devices())
    eff = rn / (n_dev * r1)
    extra = {}
    if jax.default_backend() == "cpu":
        extra["note"] = (
            "virtual CPU devices share host cores: validates the sharded "
            "program, NOT a throughput measurement (real efficiency needs "
            "real chips)"
        )
    return [_record("dlgm_dp_scaling", "scaling_efficiency", eff, "ratio",
                    rate_1dev=r1, rate_ndev=rn, **extra)]


ALL = {
    "linreg": run_linreg,
    "hier_logistic": run_hier_logistic,
    "matrix_fact": run_matrix_fact,
    "gmm": run_gmm,
    "dlgm": run_dlgm,
    "scaling": run_scaling,
}


def _run_all_subprocess(out_path):
    """One fresh process per model: a remote-TPU worker crash poisons the
    whole client process, so in-process retries cannot recover — subprocess
    isolation can (with one retry per model)."""
    import os
    import subprocess
    import sys
    import tempfile

    records = []
    for n in ALL:
        for attempt in (1, 2):
            with tempfile.NamedTemporaryFile(suffix=".json",
                                             delete=False) as tf:
                tmp = tf.name
            proc = subprocess.run(
                [sys.executable, "-m", "benchmarks.harness", "--model", n,
                 "--out", tmp],
                capture_output=True, timeout=1800, text=True,
            )
            for line in proc.stdout.splitlines():
                if line.startswith("{"):
                    print(line, flush=True)
            try:
                with open(tmp) as f:
                    recs = json.load(f)
                os.unlink(tmp)
                if proc.returncode == 0:
                    records.extend(recs)
                    break
            except Exception:
                pass
            print(json.dumps({"model": n, "attempt": attempt,
                              "error": proc.stderr[-300:]}), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(records, f, indent=2)
    return records


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="all",
                    choices=list(ALL) + ["all"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--profile", default=None, metavar="LOGDIR",
                    help="capture a jax.profiler trace (TensorBoard/"
                         "Perfetto) of the run into LOGDIR (SURVEY.md §5)")
    ap.add_argument("--fault-inject", default=None, metavar="step=K",
                    help="run the SURVEY.md §5 failure-recovery scenario: "
                         "2 local processes, one killed at step K, restart "
                         "from checkpoint, assert bit-identical recovery")
    args = ap.parse_args()
    if args.fault_inject:
        kv = dict(item.split("=") for item in args.fault_inject.split(","))
        from benchmarks.fault_inject import run_fault_inject

        records = run_fault_inject(fault_step=int(kv.get("step", 20)),
                                   total=int(kv.get("total", 30)),
                                   chunk=int(kv.get("chunk", 10)))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(records, f, indent=2)
        return records
    if args.profile:
        from bayesic_tpu.utils.metrics import profile_trace

        with profile_trace(args.profile):
            if args.model == "all":
                return _run_all_subprocess(args.out)
            return ALL[args.model]()
    if args.model == "all":
        return _run_all_subprocess(args.out)
    records = []
    for attempt in (1, 2):
        try:
            records = ALL[args.model]()
            break
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"model": args.model, "attempt": attempt,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(records, f, indent=2)
    return records


if __name__ == "__main__":
    main()
