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

PINNED MEASUREMENT PROTOCOL (VERDICT r1 item 2 — one format, stated
variance, same-sweep comparisons only):
  * one untimed compile/warm pass, then ``REPS`` (=3) timed reps;
  * each rep's fused scan is sized so the ON-CHIP wall is >= ~1-3 s: the
    remote relay adds up-to-second-scale per-CALL latency jitter, so a
    30 ms rep measures the tunnel, not the chip (measured 2026-08-17:
    spreads of 1.0-1.5 on 0.3-0.6 s reps vs 0.07-0.2 on >=1 s reps);
  * the HOST must be otherwise idle: the client thread drives the relay, so
    a concurrent CPU-bound process (e.g. the test suite) inflates rep walls
    up to 4x (measured 2026-08-17: matrix_fact 3.9-4.7 s/rep under load vs
    a stable 1.126 s idle).  Each record carries ``load_avg`` (1-min) so a
    contaminated sweep is detectable after the fact;
  * the first 1-2 reps after a cold start can run ~1.5x slow (chip clock
    ramp) even after the untimed warm pass — 5 reps + median absorbs this;
  * every rep threads EVOLVING state (SVI) or a FRESH PRNG key (MCMC/SMC)
    through the program, and fences with a real ``device_get`` of an output
    that data-depends on the whole computation (the remote relay can
    otherwise serve repeats / return early);
  * the reported value is the MEDIAN rep; ``spread`` = (max-min)/median is
    recorded alongside.  Cross-sweep comparisons must quote the spread.
  * every record carries a roofline annotation (benchmarks/roofline.py):
    estimated FLOPs + HBM bytes per step, achieved TFLOP/s, MFU, HBM
    utilization, and which wall (compute/bandwidth/overhead) the workload
    faces.

Usage:
  python -m benchmarks.harness --model dlgm
  python -m benchmarks.harness --model all --out benchmarks/results.json
  python -m benchmarks.harness --model scaling   (multi-device DP-SVI)
  python -m benchmarks.harness --fault-inject step=20
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks import roofline

# The axon sitecustomize overrides jax_platforms in every interpreter; honor
# an explicit JAX_PLATFORMS=cpu (CPU rehearsal runs) by re-pinning it here.
import os as _os_env  # noqa: E402

if _os_env.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")

# rbg bit generator: measurably faster per-step RNG on TPU (bench.py notes);
# correctness under rbg covered in tests/test_svi.py
jax.config.update("jax_default_prng_impl", "rbg")

# Persistent compile cache: the remote-TPU compile service has minutes-level
# latency variance; a warm cache makes bench wall time predictable.
import os as _os  # noqa: E402

_cache = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    ".jax_cache",
)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

REPS = 5
SMOKE = False     # set by --smoke: 10x fewer steps, CPU-sized validation


def _steps(n):
    return max(20, n // 10) if SMOKE else n


# host materialization fence — single shared implementation (the relay
# rationale lives with it in models/common.py)
from bayesic_tpu.models.common import _force  # noqa: E402


def _median_protocol(rep_fn, reps=REPS):
    """Pinned protocol: rep_fn(i) runs one FULLY FENCED rep and returns its
    wall seconds (state/keys must differ per rep).  Returns
    (median, spread, times).

    Contention handling: the TPU worker is a shared remote tenant, and
    another tenant saturating the chip shows up as one-sided slowdowns
    (observed up to 20x; local load_avg cannot see it).  If the spread of
    the fastest ``reps`` times exceeds the target (5% — VERDICT r2 item 5:
    every shipped record must carry a clean window), keep adding reps (up
    to 5*reps) until that window is clean, then report the median of the
    fastest ``reps`` — contention only ever slows a rep, never speeds it,
    so the fastest window is the least contaminated sample.  ``spread`` is
    reported for the kept window; the record carries total reps run, so a
    record whose spread still exceeds the target after 5*reps is visibly
    marked by reps==5*REPS."""
    times = [rep_fn(i) for i in range(reps)]

    def window_spread(ts):
        kept = sorted(ts)[:reps]
        med = float(np.median(kept))
        sp = float((max(kept) - min(kept)) / med) if med > 0 else 0.0
        return kept, med, sp

    kept, med, spread = window_spread(times)
    while spread > 0.05 and len(times) < 5 * reps:
        times.append(rep_fn(len(times)))
        kept, med, spread = window_spread(times)
    return med, spread, times


def _record(name, metric, value, unit, **extra):
    rec = {"model": name, "metric": metric, "value": float(value),
           "unit": unit, "platform": jax.default_backend(),
           "n_devices": jax.device_count(),
           "load_avg": round(_os.getloadavg()[0], 2)}
    rec.update(extra)
    print(json.dumps(rec), flush=True)
    return rec


def bench_svi(name, svi, key, steps, model_args=None, cost=None,
              dtype="float32"):
    steps = _steps(steps)
    state = svi.init(key)

    # data rides as a traced jit argument, NOT a closure constant — embedded
    # multi-MB constants make remote compiles pathologically slow
    def block(s, margs):
        def body(c, _):
            new, loss = svi.step(c, model_args=margs)
            return new, loss

        return jax.lax.scan(body, s, None, length=steps)

    blk = jax.jit(block)
    state, losses = blk(state, model_args)   # compile/warm (untimed)
    _force(losses)

    holder = {"state": state}

    def rep(_i):
        t0 = time.perf_counter()
        holder["state"], losses = blk(holder["state"], model_args)
        _force(losses)
        holder["losses"] = losses
        return time.perf_counter() - t0

    med, spread, times = _median_protocol(rep)
    rate = steps / med / jax.device_count()
    rec = _record(name, "elbo_steps_per_s_per_chip", rate, "steps/s/chip",
                  steps=steps, reps=len(times), spread=round(spread, 4),
                  final_loss=float(holder["losses"][-1]))
    if cost is not None:
        roofline.annotate(rec, *cost, steps_per_s=rate * jax.device_count(),
                          dtype=dtype, platform=jax.default_backend())
        print(json.dumps({k: rec[k] for k in
                          ("model", "achieved_tflops", "mfu", "hbm_util",
                           "bound")}), flush=True)
    return rec




def bench_fused(name, fused_call, steps, cost=None, extra=None,
                final_loss_holder=None, bound_override=None):
    """Shared protocol wrapper for the whole-run fused trainers: one
    untimed warm call, then _median_protocol over fully-fenced reps that
    thread EVOLVING state (the caller's fused_call(seed) closure must
    update its own holder and return the loss trace)."""
    _force(fused_call(1))
    holder = {}

    def rep(i):
        t0 = time.perf_counter()
        losses = fused_call(2 + i)
        _force(losses)
        holder["last_loss"] = float(np.asarray(losses)[-1])
        return time.perf_counter() - t0

    med, spread, times = _median_protocol(rep)
    rate = steps / med / jax.device_count()
    rec = _record(name, "elbo_steps_per_s_per_chip", rate, "steps/s/chip",
                  steps=steps, reps=len(times), spread=round(spread, 4),
                  final_loss=holder.get("last_loss"),
                  **(extra or {}))
    if cost is not None:
        roofline.annotate(rec, *cost,
                          steps_per_s=rate * jax.device_count(),
                          platform=jax.default_backend(),
                          bound_override=bound_override)
    return rec


def bench_nuts_ess(name, mcmc, key, segmented=None, reps=REPS,
                   cost_per_leapfrog=None, rhat_gate=1.01):
    """NUTS throughput with a convergence gate: each rep is a full
    warmup+sampling run under a FRESH key; value = median min-ESS/s/chip;
    the record carries max split-R-hat (must be < rhat_gate for the number
    to count) and the leapfrog-level roofline.

    Diagnostics are computed ON DEVICE and only scalars cross the
    host link: the dlgm_nuts sample buffer is ~420 MB, and a
    device_get of it through the remote-TPU relay costs ~16 s — the
    r1-r3 records timed that transfer as if it were sampling (the
    entire 17 s r3 wall was ~95% relay transfer; the bare kernel scan
    runs 100 transitions in 0.25 s).  The on-device min-ESS/max-R-hat
    reduction (0.16 s) is also the fence: its value data-depends on
    every sample, which a relay-unsafe block_until_ready does not
    guarantee (models/common._force rationale)."""
    from bayesic_tpu.utils import diagnostics as diag

    @jax.jit
    def _diag_fn(qs, divs, nsteps):
        return (jnp.min(diag.ess(qs)), jnp.max(diag.split_rhat(qs)),
                jnp.sum(divs), jnp.mean(nsteps))

    def once(k):
        if segmented:
            wc, sc = segmented
            return mcmc.run_segmented(k, warmup_chunk=wc, sample_chunk=sc)
        # run() caches its compiled program on the instance with PRNG
        # keys as traced arguments — fresh keys never re-trace
        return mcmc.run(k)

    r0 = once(key)   # compile run + diagnostics programs (untimed)
    _ = [float(v) for v in _diag_fn(
        r0.unconstrained, r0.extra["diverging"], r0.extra["num_steps"])]

    stats = []

    def rep(i):
        k = jax.random.fold_in(key, i + 1)
        t0 = time.perf_counter()
        res = once(k)
        qs = res.unconstrained            # (chains, samples, dim)
        min_ess, max_rhat, div, nsteps = _diag_fn(
            qs, res.extra["diverging"], res.extra["num_steps"])
        # scalar device_get = the fence for the whole rep
        min_ess, max_rhat, div, nsteps = (
            float(min_ess), float(max_rhat), int(div), float(nsteps))
        dt = time.perf_counter() - t0
        stats.append((min_ess, max_rhat, dt, nsteps, div))
        return dt

    med, spread, times = _median_protocol(rep, reps=reps)
    i_med = int(np.argmin([abs(t - med) for t in times]))
    min_ess, max_rhat, dt, mean_steps, div = stats[i_med]
    rate = min_ess / dt / jax.device_count()
    # super-unity ESS note (VERDICT r2 item 9): min-ESS can exceed the
    # draw count — NUTS chains are ANTITHETIC (negative lag-1
    # autocorrelation), and the Geyer estimator correctly reports
    # tau < 1 then (validated against an analytic AR(1) oracle in
    # tests/test_diagnostics_ess.py).  The capped companion is reported
    # so cross-round comparisons can't be flattered by estimator
    # behavior: `min_ess_capped` clips at chains*samples.
    n_draws = mcmc.num_chains * mcmc.num_samples
    rec = _record(name, "ess_per_s_per_chip", rate, "ess/s/chip",
                  min_ess=min_ess, max_rhat=round(max_rhat, 4),
                  converged=bool(max_rhat < rhat_gate), wall_s=round(dt, 2),
                  reps=len(times), spread=round(spread, 4),
                  chains=mcmc.num_chains, samples=mcmc.num_samples,
                  warmup=mcmc.num_warmup, divergences=div,
                  mean_tree_steps=round(mean_steps, 1),
                  min_ess_capped=min(min_ess, n_draws),
                  ess_per_draw=round(min_ess / n_draws, 3),
                  ess_capped_per_s_per_chip=round(
                      min(min_ess, n_draws) / dt / jax.device_count(), 1))
    if cost_per_leapfrog is not None:
        total_leapfrogs = mean_steps * (mcmc.num_warmup + mcmc.num_samples)
        f, b = cost_per_leapfrog
        roofline.annotate(rec, f, b,
                          steps_per_s=total_leapfrogs / dt,
                          platform=jax.default_backend())
        print(json.dumps({k: rec[k] for k in
                          ("model", "achieved_tflops", "mfu", "hbm_util",
                           "bound")}), flush=True)
    return rec


def run_linreg():
    import optax

    from bayesic_tpu.infer.svi import SVI, MeanFieldGuide
    from bayesic_tpu.models import linreg

    cfg = linreg.Config(n=16384, dim=64)
    x, y, *_ = linreg.make_data(cfg)
    svi = SVI(linreg.model, MeanFieldGuide, optax.adam(0.05),
              model_args=(x, y, cfg.noise))
    recs = [bench_svi("linreg", svi, jax.random.PRNGKey(0), 20_000,
                      model_args=(x, y, cfg.noise),
                      cost=roofline.linreg_svi(cfg.n, cfg.dim))]

    # whole-run fused Pallas trainer (ops/fused_linreg.py): exact Gram
    # sufficient statistics, one launch per rep
    if jax.default_backend() == "tpu":
        from bayesic_tpu.ops import fused_linreg as fl

        # 1.5M steps/rep: at ~1.3M steps/s the rep wall is >=1 s, which the
        # protocol needs for a clean window (r2 shipped linreg_fused with
        # spread 0.21 off 0.4 s reps — VERDICT r2 weak item 2)
        steps_f = _steps(1_500_000)
        packed = fl.pack_data(x, y)
        loc0, ls0 = fl.pack_params(cfg.dim)
        zz = jnp.zeros((1, 128), jnp.float32)
        holder_f = {"loc": loc0, "ls": ls0,
                    "opt": (zz, zz, zz, zz), "t0": 0}

        def fused_call(seed):
            loc, ls, opt, losses = fl.fused_train(
                packed, cfg.dim, cfg.noise, holder_f["loc"],
                holder_f["ls"], holder_f["opt"], steps=steps_f,
                lr0=cfg.lr, lr_total=steps_f, seed=seed,
                t0=holder_f["t0"])
            holder_f.update(loc=loc, ls=ls, opt=opt,
                            t0=holder_f["t0"] + steps_f)
            return losses

        recs.append(bench_fused("linreg_fused", fused_call, steps_f,
                                cost=roofline.linreg_fused_step(),
                                bound_override="serial-latency",
                                extra={"sufficient_stats": True}))
    return recs


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
    recs = [bench_svi("hier_logistic", svi, jax.random.PRNGKey(0), 10_000,
                      model_args=(x, y, group),
                      cost=roofline.hier_logistic_svi(
                          cfg.batch_size, cfg.num_features, cfg.num_groups))]

    # whole-run-in-VMEM fused Pallas trainer (ops/fused_hier.py) on the
    # SAME workload: one kernel launch per rep
    if jax.default_backend() == "tpu":
        from bayesic_tpu.ops import fused_hier as fh

        steps_f = _steps(500_000)   # ~1 s/rep at the measured 455k steps/s
        packed = fh.pack_data(x, y, group)
        packed = packed[jax.random.permutation(jax.random.PRNGKey(8),
                                               x.shape[0])]
        loc0, ls0 = fh.pack_params()
        zz = jnp.zeros((1, 128), jnp.float32)
        holder_f = {"loc": loc0, "ls": ls0,
                    "opt": (zz, zz, zz, zz), "t0": 0}

        def fused_call(seed):
            loc, ls, opt, losses = fh.fused_train(
                packed, holder_f["loc"], holder_f["ls"], holder_f["opt"],
                steps=steps_f, lr0=cfg.lr, lr_total=steps_f, seed=seed,
                batch=cfg.batch_size, t0=holder_f["t0"])
            holder_f.update(loc=loc, ls=ls, opt=opt,
                            t0=holder_f["t0"] + steps_f)
            return losses

        recs.append(bench_fused(
            "hier_logistic_fused", fused_call, steps_f,
            cost=roofline.hier_logistic_svi(
                cfg.batch_size, cfg.num_features, cfg.num_groups)))

    # Full-batch NUTS, CENTERED parameterization (data-dominated regime —
    # the round-1 non-centered form mixed at min-ESS 64/25,600; see
    # hl.make_model docstring for the measured comparison).  Long warmup is
    # restored via run_segmented: bounded programs avoid the remote-worker
    # fault that forced round 1 down to 200 warmup steps.
    full = hl.make_model(cfg.num_groups, cfg.num_features, None,
                         centered=True)
    chains = 128
    warm, samp = _steps(500), _steps(300)
    mcmc = MCMC(model=full, num_warmup=warm, num_samples=samp,
                num_chains=chains, shared_adapt=True,
                model_args=(x, y, group), target_accept=0.85)
    n_obs = cfg.num_groups * cfg.obs_per_group
    recs.append(bench_nuts_ess(
        "hier_logistic_nuts", mcmc, jax.random.PRNGKey(1),
        segmented=(125, 150),
        cost_per_leapfrog=roofline.hier_logistic_nuts_leapfrog(
            n_obs, cfg.num_features, chains),
    ))

    # the SAME workload through the fused Pallas whole-transition kernel
    # (ops/fused_nuts_hier.py, VERDICT r4 item 2): identical model density,
    # driver, adaptation and diagnostics, held to the same R-hat gate and
    # capped-ESS protocol — only the per-transition tree build runs as one
    # VMEM-resident kernel launch per chain block.
    if jax.default_backend() == "tpu":
        mcmc_f = hl.fused_nuts_mcmc(
            cfg.num_groups, cfg.num_features, x, y, group,
            num_warmup=warm, num_samples=samp, num_chains=chains,
            target_accept=0.85)
        recs.append(bench_nuts_ess(
            "hier_logistic_nuts_fused", mcmc_f, jax.random.PRNGKey(1),
            segmented=(125, 150),
            cost_per_leapfrog=roofline.hier_logistic_nuts_leapfrog(
                n_obs, cfg.num_features, chains),
        ))
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
    recs = [bench_svi("matrix_fact", svi, jax.random.PRNGKey(0), 3000,
                      model_args=(users, items, ratings),
                      cost=roofline.matrix_fact_svi(
                          cfg.batch_size, cfg.num_factors, cfg.num_users,
                          cfg.num_items))]

    # dense sufficient-statistics analytic-ELBO path (VERDICT r2 item 2):
    # each dense step is an EXACT full-batch deterministic ELBO step — the
    # work of num_ratings/batch_size mini-batch steps with zero gradient
    # variance (see models/matrix_fact.py dense docblock)
    import functools as _ft

    cnt, rsum, sqsum, n_r = mf.dense_stats(users, items, ratings,
                                           cfg.num_users, cfg.num_items)
    steps_d = _steps(20_000)
    params0 = mf.dense_init(cfg, jax.random.PRNGKey(0))
    opt = optax.adam(2e-3)
    loss_fn = _ft.partial(mf.dense_neg_elbo, sqsum=sqsum, n_ratings=n_r,
                          noise=cfg.noise)

    @jax.jit
    def dense_block(carry, cnt, rsum):
        def body(c, _):
            p, s = c
            loss, g = jax.value_and_grad(loss_fn)(p, cnt, rsum)
            upd, s = opt.update(g, s, p)
            return (optax.apply_updates(p, upd), s), loss

        return jax.lax.scan(body, carry, None, length=steps_d)

    carry0 = (params0, opt.init(params0))
    carry0, losses = dense_block(carry0, cnt, rsum)   # compile/warm
    _force(losses)
    holder_d = {"carry": carry0}

    def rep_d(_i):
        t0 = time.perf_counter()
        holder_d["carry"], losses = dense_block(holder_d["carry"], cnt,
                                                rsum)
        _force(losses)
        holder_d["loss"] = float(np.asarray(losses)[-1])
        return time.perf_counter() - t0

    med, spread, times = _median_protocol(rep_d)
    rate = steps_d / med / jax.device_count()
    rec = _record("matrix_fact_dense", "elbo_steps_per_s_per_chip", rate,
                  "steps/s/chip", steps=steps_d, reps=len(times),
                  spread=round(spread, 4), final_loss=holder_d["loss"],
                  equiv_minibatch_steps_per_step=round(
                      n_r / cfg.batch_size, 1),
                  estimator="analytic full-batch ELBO (deterministic)")
    roofline.annotate(rec, *roofline.matrix_fact_dense(
        cfg.num_users, cfg.num_items, cfg.num_factors),
        steps_per_s=rate * jax.device_count(),
        platform=jax.default_backend())
    print(json.dumps({k: rec[k] for k in
                      ("model", "achieved_tflops", "mfu", "hbm_util",
                       "bound")}), flush=True)
    recs.append(rec)

    # fused Pallas kernel on the same dense objective (ops/mf_dense.py):
    # whole cell-space value+grad in one pass over (cnt, rsum)
    if jax.default_backend() == "tpu":
        from bayesic_tpu.ops import mf_dense

        steps_k = _steps(50_000)
        holder_k = {"p": mf.dense_init(cfg, jax.random.PRNGKey(0)),
                    "opt": None}

        def fused_call(_seed):
            p, opt_state, losses = mf_dense.fused_train(
                holder_k["p"], cnt, rsum, sqsum, n_r, cfg.noise,
                steps=steps_k, lr=2e-3, mm_dtype="bfloat16",
                opt_state=holder_k["opt"])
            holder_k.update(p=p, opt=opt_state)
            return losses

        rec_k = bench_fused(
            "matrix_fact_fused", fused_call, steps_k,
            cost=roofline.matrix_fact_fused(cfg.num_users, cfg.num_items),
            extra={"estimator": "analytic full-batch ELBO (deterministic)",
                   "equiv_minibatch_steps_per_step": round(
                       n_r / cfg.batch_size, 1)})
        recs.append(rec_k)
    return recs


def run_gmm():
    from bayesic_tpu.models import gmm

    cfg = gmm.Config(num_particles=8192, num_data=2000)
    x, _ = gmm.make_data(cfg)
    model = gmm.make_model(cfg, x)
    from bayesic_tpu.infer.smc import SMC

    def make(mode):
        bl = blg = bm = None
        if mode != "xla":
            probe = SMC(model, num_particles=cfg.num_particles)
            bl = gmm.make_batched_loglik(probe.info, probe._unravel, x)
            blg = gmm.make_batched_loglik_grad(
                probe.info, probe._unravel, probe._ravel, x)
        if mode == "fused":
            # whole-stage fused mutation (ops/fused_smc_gmm.py): one
            # launch per stage + carried loglik (VERDICT r4 item 5)
            bm = gmm.make_batched_mutation(cfg, x)
        return SMC(model, num_particles=cfg.num_particles,
                   mutation_steps=cfg.mutation_steps,
                   hmc_leapfrog_steps=cfg.leapfrog_steps,
                   batched_loglik=bl, batched_loglik_grad=blg,
                   batched_mutation=bm)

    recs = []
    modes = (["xla", "pallas", "fused"]
             if jax.default_backend() == "tpu" else ["xla"])
    for mode in modes:
        smc = make(mode)
        # stage_chunk=24: the typical run needs ~20 stages, so the whole
        # tempering loop fits one chunk program and pays ONE ~50 ms relay
        # fence instead of three (the library default stays 8 — bounded
        # programs for fault-prone long runs; the bench values wall time)
        smc.run(jax.random.PRNGKey(0), stage_chunk=24)   # compile (untimed)
        info = {"stages_per_rep": [], "logz": []}

        def rep(i):
            k = jax.random.PRNGKey(100 + i)
            t0 = time.perf_counter()
            res = smc.run(k, stage_chunk=24)
            _force(res.log_evidence)
            dt = time.perf_counter() - t0
            info["stages_per_rep"].append(int(res.num_stages))
            info["logz"].append(float(res.log_evidence))
            return dt

        med, spread, times = _median_protocol(rep)
        # adaptive tempering: stage count varies per key, so pair the
        # stage count WITH the median-time rep (r2 review: mixing the
        # last rep's stages with another rep's wall over-reports)
        i_med = int(np.argmin([abs(t - med) for t in times]))
        stages = info["stages_per_rep"][i_med]
        rec = _record(
            "gmm_smc" + {"xla": "", "pallas": "_pallas",
                         "fused": "_fused"}[mode],
            "particle_stages_per_s_per_chip",
            cfg.num_particles * stages / med / jax.device_count(),
            "particle-stages/s/chip", stages=stages, wall_s=round(med, 2),
            reps=len(times), spread=round(spread, 4),
            # log-evidence per the median rep + across-seed spread: the
            # fused-stage record must show logZ stability (VERDICT r4
            # item 5's acceptance bar)
            log_evidence=round(info["logz"][i_med], 2),
            logz_range=round(max(info["logz"]) - min(info["logz"]), 2),
        )
        f, b = roofline.gmm_smc_stage(
            cfg.num_particles, cfg.num_data, cfg.num_components, 2,
            cfg.mutation_steps, cfg.leapfrog_steps)
        roofline.annotate(rec, f, b, steps_per_s=stages / med,
                          platform=jax.default_backend())
        recs.append(rec)
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
    recs = [bench_svi("dlgm", svi, jax.random.PRNGKey(0), 20_000,
                      model_args=(x,),
                      cost=roofline.dlgm_svi(cfg.batch_size, cfg.data_dim,
                                             cfg.latent_dim, cfg.hidden),
                      dtype=cfg.compute_dtype)]

    # whole-run-in-VMEM fused Pallas trainer (ops/fused_vae.py) on the SAME
    # workload: one kernel launch per rep, params/Adam/data device-resident
    from bayesic_tpu.models.dlgm import fused_init
    from bayesic_tpu.ops import fused_vae as fv

    if jax.default_backend() == "tpu":   # interpret mode is no perf point
        steps_f = _steps(60_000)    # ~1 s/rep at the measured 55.6k steps/s
        xs = x[jax.random.permutation(jax.random.PRNGKey(8), cfg.num_data)]
        fp, fm, fvv = fused_init(cfg, jax.random.PRNGKey(0))
        holder_f = {"p": fp, "m": fm, "v": fvv, "t0": 0}

        def fused_call(seed):
            p, m, v, losses = fv.fused_train(
                xs, holder_f["p"], holder_f["m"], holder_f["v"],
                steps=steps_f, lr=cfg.lr, seed=seed, batch=cfg.batch_size,
                gather="block", t0=holder_f["t0"])
            holder_f.update(p=p, m=m, v=v, t0=holder_f["t0"] + steps_f)
            return losses

        rec_f = bench_fused("dlgm_fused", fused_call, steps_f,
                            cost=roofline.dlgm_svi(
                                cfg.batch_size, cfg.data_dim,
                                cfg.latent_dim, cfg.hidden))
        recs.append(rec_f)

    # the 1024-sharded-chain NUTS variant (configs[4]) with pooled
    # cross-chain adaptation, held to the hier_logistic standard (VERDICT
    # r2 item 5): routed through bench_nuts_ess — R-hat gate, divergence
    # count, capped-ESS companion — on a 64-row local-posterior batch
    # (512-dim latent per chain)
    out = dlgm.run_svi(dlgm.Config(num_data=2048, data_dim=32,
                                   latent_dim=8, hidden=64, batch_size=256,
                                   steps=_steps(200)))
    from bayesic_tpu.models.dlgm import local_posterior_mcmc

    n_chains = 256 if SMOKE else 1024
    n_rows = 8 if SMOKE else 64
    cfg2 = dlgm.Config(num_data=2048, data_dim=32, latent_dim=8, hidden=64,
                       num_chains=n_chains, num_warmup=_steps(200),
                       num_samples=_steps(200))
    mcmc2, _ = local_posterior_mcmc(
        cfg2, out["decoder"], out["decoder_params"], out["sigma_x"],
        out["x"][:n_rows], jax.random.PRNGKey(2))
    recs.append(bench_nuts_ess(
        "dlgm_nuts", mcmc2, jax.random.PRNGKey(2),
        cost_per_leapfrog=roofline.dlgm_nuts_leapfrog(
            n_rows, cfg2.latent_dim, cfg2.hidden, cfg2.data_dim,
            n_chains)))

    # the SAME workload through the fused Pallas whole-transition kernel
    # (ops/fused_nuts.py, VERDICT r3 item 2): identical model density,
    # driver, adaptation and diagnostics — only the per-transition tree
    # build runs as one VMEM-resident kernel launch per chain block.
    # block_chains=64 (round 5): the Mosaic vmem cap raise made 64 fit
    # and halving the grid is 1.51x on raw transitions/s (best-of-3,
    # split: 180.4 vs 119.7 at bc=32 — benchmarks/_nuts_probe2b.py);
    # 128 still OOMs XLA's fixed 16 MB scoped-VMEM stack for the
    # pallas-call fusion (18.9 MB), which vmem_limit_bytes cannot raise.
    if jax.default_backend() == "tpu":
        from bayesic_tpu.models.dlgm import local_posterior_mcmc_fused

        # mm_dtype="split" (VERDICT r4 item 4): 3-pass hi/lo value dots,
        # single-pass bf16 gradient dots inside the tree
        mcmc3 = local_posterior_mcmc_fused(
            cfg2, out["decoder"], out["decoder_params"], out["sigma_x"],
            out["x"][:n_rows], block_chains=64, mm_dtype="split")
        recs.append(bench_nuts_ess(
            "dlgm_nuts_fused", mcmc3, jax.random.PRNGKey(2),
            cost_per_leapfrog=roofline.dlgm_nuts_leapfrog(
                n_rows, cfg2.latent_dim, cfg2.hidden, cfg2.data_dim,
                n_chains)))
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

    # SMOKE (the CI smoke test on the 8-device virtual CPU mesh, VERDICT r4
    # item 6): shrink to program-validation size — the efficiency RATIO is
    # meaningless on virtual devices sharing host cores, but the records
    # must exist, carry scaling_efficiency, and be finite.
    d_per = 512 if SMOKE else 4096
    b_per = 64 if SMOKE else 256
    scan_len = _steps(100)
    cfg = dlgm.Config(num_data=d_per * n_dev, data_dim=64, latent_dim=16,
                      hidden=128, batch_size=b_per * n_dev)
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

            return jax.lax.scan(body, s, None, length=scan_len)

        blk = jax.jit(block)
        state2, losses = blk(state)
        _force(losses)
        holder = {"s": state2}

        def rep(_):
            t0 = time.perf_counter()
            holder["s"], losses = blk(holder["s"])
            _force(losses)
            return time.perf_counter() - t0

        med, _, _ = _median_protocol(rep, reps=2 if SMOKE else REPS)
        return scan_len / med

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
    recs = [_record("dlgm_dp_scaling", "scaling_efficiency", eff, "ratio",
                    rate_1dev=r1, rate_ndev=rn, **extra)]

    # fused-trainer DP (VERDICT r2 item 3): segment-averaged hier trainer
    # over the data axis vs the single-device fused trainer
    from bayesic_tpu.models import hier_logistic as hl
    from bayesic_tpu.ops import fused_hier as fh
    from bayesic_tpu.parallel import make_mesh
    from bayesic_tpu.parallel.dp_fused import segment_averaged_train

    hcfg = hl.Config()
    hx, hy, hgroup, _ = hl.make_data(hcfg)
    nrows = (hx.shape[0] // (8 * n_dev)) * (8 * n_dev)
    packed = fh.pack_data(hx, hy, hgroup)[
        jax.random.permutation(jax.random.PRNGKey(8), hx.shape[0])][:nrows]
    interp = jax.default_backend() != "tpu"
    segments, sps = (4, 5) if SMOKE else (20, 10)
    total = segments * sps
    loc0, ls0 = fh.pack_params()
    zz = jnp.zeros((1, 128), jnp.float32)
    state0 = (loc0, ls0, (zz, zz, zz, zz))

    def local_train(data_local, st, seed, t0):
        loc, ls, opt = st
        loc, ls, opt, losses = fh.fused_train(
            data_local, loc, ls, opt, steps=sps, lr0=hcfg.lr,
            lr_total=total, seed=seed, batch=hcfg.batch_size, t0=t0,
            n_total=nrows, interpret=interp)
        return (loc, ls, opt), losses

    mesh_n = make_mesh({"data": n_dev})

    def dp_rate():
        holder = {"st": state0}

        def rep(i):
            t0 = time.perf_counter()
            holder["st"], losses = segment_averaged_train(
                local_train, holder["st"], packed, mesh_n,
                segments=segments, steps_per_segment=sps, seed=i,
                hierarchical_scales=True)
            _force(losses)
            return time.perf_counter() - t0

        rep(0)   # warm/compile
        med, _, _ = _median_protocol(rep, reps=1 if SMOKE else 3)
        return total / med

    def single_rate():
        holder = {"st": state0}

        def rep(i):
            loc, ls, opt = holder["st"]
            t0 = time.perf_counter()
            loc, ls, opt, losses = fh.fused_train(
                packed, loc, ls, opt, steps=total, lr0=hcfg.lr,
                lr_total=total, seed=i, batch=hcfg.batch_size,
                n_total=nrows, interpret=interp)
            _force(losses)
            holder["st"] = (loc, ls, opt)
            return time.perf_counter() - t0

        rep(0)
        med, _, _ = _median_protocol(rep, reps=1 if SMOKE else 3)
        return total / med

    rf1, rfn = single_rate(), dp_rate()
    recs.append(_record(
        "hier_fused_dp_scaling", "scaling_efficiency",
        rfn / (n_dev * rf1), "ratio", rate_1dev=rf1, rate_ndev=rfn,
        segments=segments, steps_per_segment=sps, **extra))
    return recs


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
            cmd = [sys.executable, "-m", "benchmarks.harness", "--model", n,
                   "--out", tmp]
            if SMOKE:
                cmd.append("--smoke")
            proc = subprocess.run(
                cmd, capture_output=True, timeout=2400, text=True,
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
    global SMOKE
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="all",
                    choices=list(ALL) + ["all"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--smoke", action="store_true",
                    help="10x fewer steps — protocol validation, not a "
                         "measurement")
    ap.add_argument("--profile", default=None, metavar="LOGDIR",
                    help="capture a jax.profiler trace (TensorBoard/"
                         "Perfetto) of the run into LOGDIR (SURVEY.md §5)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "pins jax_platforms='axon,cpu' at interpreter "
                         "start, so the env var alone cannot opt out of "
                         "the remote-TPU tunnel — this flag can)")
    ap.add_argument("--selftest", action="store_true",
                    help="on-TPU correctness gate for the fused trainer "
                         "tier (SURVEY.md §4.7): run each Mosaic-compiled "
                         "trainer with its real on-core PRNG stream to "
                         "convergence and assert posterior/loss agreement "
                         "with the analytic or XLA-path oracle; exits "
                         "nonzero on any failure (CPU falls back to "
                         "interpret mode)")
    ap.add_argument("--fault-inject", default=None, metavar="step=K",
                    help="run the SURVEY.md §5 failure-recovery scenario: "
                         "2 local processes, one killed at step K, restart "
                         "from checkpoint, assert bit-identical recovery")
    args = ap.parse_args()
    SMOKE = args.smoke
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.selftest:
        import sys

        from benchmarks.selftest import run_selftest

        recs, ok = run_selftest()
        if args.out:
            with open(args.out, "w") as f:
                json.dump(recs, f, indent=2)
        if not ok:
            sys.exit(1)
        return recs
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
