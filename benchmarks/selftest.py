"""On-TPU correctness gate for the fused trainer tier (VERDICT r2 item 4;
SURVEY.md §4.7).

The interpret-mode parity tests prove the kernel MATH; this module proves
the ON-CHIP programs — the Mosaic-compiled kernels with the real
``pltpu.prng_*`` stream — converge to the right posteriors:

  * linreg_fused  -> analytic Gaussian posterior (mean within atol, sd
    within rtol — the same gate as the CPU oracle test)
  * hier_fused    -> the XLA-path SVI optimum on the same data
    (agreement on mu / log-tau / beta posterior means)
  * dlgm_fused    -> the fused-trained parameters must achieve an XLA-
    evaluated ELBO at least as good as the XLA-trained one (tolerance 2%)
  * matrix_fact_fused -> posterior-mean RMSE at the noise floor and the
    analytic dense loss within 1% of the XLA dense path's

Run: ``python -m benchmarks.harness --selftest`` (TPU; CPU falls back to
interpret mode, which still validates the plumbing end to end).
Each check emits one JSON line {"selftest": name, "ok": bool, ...}; the
process exits nonzero if any gate fails.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np


def _emit(name, ok, **extra):
    rec = {"selftest": name, "ok": bool(ok),
           "platform": jax.default_backend()}
    rec.update({k: (round(float(v), 5) if isinstance(v, (int, float))
                    or hasattr(v, "item") else v)
                for k, v in extra.items()})
    print(json.dumps(rec), flush=True)
    return rec


def selftest_linreg(interpret):
    from bayesic_tpu.models import linreg
    from bayesic_tpu.ops import fused_linreg as fl

    cfg = linreg.Config(n=4096, dim=16)
    x, y, _, _ = linreg.make_data(cfg)
    packed = fl.pack_data(x, y)
    loc, ls = fl.pack_params(cfg.dim)
    steps = 20_000
    loc, ls, _, losses = fl.fused_train(
        packed, cfg.dim, cfg.noise, loc, ls, steps=steps, lr0=0.05,
        seed=7, interpret=interpret)
    mean, std = fl.unpack_stats(loc, ls, cfg.dim)
    ref_mean, ref_cov = linreg.analytic_posterior(x, y, cfg.noise)
    got = np.concatenate([mean["w"], [mean["b"]]])
    got_sd = np.concatenate([std["w"], [std["b"]]])
    ref_sd = np.sqrt(np.diag(ref_cov))
    mean_err = float(np.abs(got - ref_mean).max())
    sd_relerr = float(np.abs(got_sd / ref_sd - 1.0).max())
    ok = mean_err < 0.02 and sd_relerr < 0.3 and \
        float(losses[-1]) < float(losses[0])
    return _emit("linreg_fused_vs_analytic", ok, mean_err=mean_err,
                 sd_relerr=sd_relerr, steps=steps)


def selftest_hier(interpret):
    import optax

    from bayesic_tpu.infer.svi import SVI, MeanFieldGuide
    from bayesic_tpu.models import hier_logistic as hl
    from bayesic_tpu.ops import fused_hier as fh

    cfg = hl.Config()
    x, y, group, _ = hl.make_data(cfg)
    packed = fh.pack_data(x, y, group)[
        jax.random.permutation(jax.random.PRNGKey(8), x.shape[0])]
    loc, ls = fh.pack_params()
    steps = 30_000
    loc, ls, _, _ = fh.fused_train(
        packed, loc, ls, None, steps=steps, lr0=cfg.lr, lr_total=steps,
        seed=9, batch=cfg.batch_size, interpret=interpret)
    m_f, s_f = fh.unpack_stats(loc, ls)

    model = hl.make_model(cfg.num_groups, cfg.num_features, cfg.batch_size)
    svi = SVI(model, MeanFieldGuide,
              optax.adam(optax.cosine_decay_schedule(cfg.lr, steps)),
              model_args=(x, y, group))
    res = svi.run(jax.random.PRNGKey(1), steps)
    m_x, _ = svi.guide.stats(res.params)

    err_mu = abs(float(m_f["mu"]) - float(m_x["mu"]))
    err_tau = abs(float(m_f["tau"]) - float(m_x["tau"]))
    err_beta = float(np.abs(np.asarray(m_f["beta"])
                            - np.asarray(m_x["beta"])).max())
    ok = err_mu < 0.15 and err_tau < 0.3 and err_beta < 0.15
    return _emit("hier_fused_vs_xla_svi", ok, err_mu=err_mu,
                 err_tau=err_tau, err_beta=err_beta, steps=steps)


def selftest_dlgm(interpret):
    from bayesic_tpu.models import dlgm

    # num_data=8192/batch=512 exceeded the 16 MiB scoped-VMEM stack limit
    # on real Mosaic (17.58M measured, 2026-08-19) — the dataset and batch
    # workspace are VMEM-resident by design, so the selftest config must
    # fit; 4096x64 @ B=256 leaves ~3M headroom and tests the same
    # on-core-PRNG statistical contract
    cfg = dlgm.Config(num_data=4096, data_dim=64, latent_dim=16,
                      hidden=128, batch_size=256, steps=8000)
    # run_svi_fused picks interpret mode from the backend itself, so this
    # exercises the REAL Mosaic program + on-core PRNG on TPU
    out_f = dlgm.run_svi_fused(cfg)
    out_x = dlgm.run_svi(cfg)

    # full-pipeline evaluation (catches layout/constant bugs the loss
    # trace alone would hide): push data through the fused-trained
    # encoder leaves in plain jnp, decode through the FLAX decoder built
    # from the fused leaves (fused_to_flax), and compare reconstruction
    # RMSE against the XLA-trained pipeline's on the same data
    x = dlgm.make_data(cfg)
    p = out_f["params"]
    h = jnp.tanh(x @ p["w1e"] + p["b1e"])
    mu_f = h @ p["wmu"] + p["bmu"]
    dec = dlgm.Decoder(cfg.data_dim, cfg.hidden)
    rec_f = dec.apply(out_f["decoder_params"], mu_f)
    rmse_f = float(jnp.sqrt(jnp.mean((rec_f - x) ** 2)))

    enc = out_x["encoder"]
    mu_x, _ = enc.apply(out_x["guide_params"], x)
    rec_x = dec.apply(out_x["decoder_params"], mu_x)
    rmse_x = float(jnp.sqrt(jnp.mean((rec_x - x) ** 2)))

    # smoothed terminal minibatch -ELBO, same estimator on both paths
    k = max(1, len(out_f["losses"]) // 10)
    loss_f = float(np.mean(out_f["losses"][-k:]))
    kx = max(1, len(out_x["losses"]) // 10)
    loss_x = float(np.mean(out_x["losses"][-kx:]))
    loss_gap = (loss_f - loss_x) / abs(loss_x)

    # noise floor is 0.3 (make_data); both paths should sit near it and
    # the fused path must match the XLA pipeline
    ok = rmse_f < 1.1 * rmse_x and rmse_f < 2.0 * 0.3 and loss_gap < 0.02
    sig_err = abs(out_f["sigma_x"] - out_x["sigma_x"])
    return _emit("dlgm_fused_vs_xla_recon", ok, rmse_fused=rmse_f,
                 rmse_xla=rmse_x, loss_gap=loss_gap, sigma_err=sig_err,
                 steps=cfg.steps)


def selftest_matrix_fact(interpret):
    from bayesic_tpu.models import matrix_fact as mf
    from bayesic_tpu.ops import mf_dense

    cfg = mf.Config(num_users=600, num_items=300, num_ratings=100_000,
                    steps=4000)
    users, items, ratings, _ = mf.make_data(cfg)
    cnt, rsum, sqsum, n = mf.dense_stats(users, items, ratings,
                                         cfg.num_users, cfg.num_items)
    p0 = mf.dense_init(cfg, jax.random.PRNGKey(0))
    p, _, losses = mf_dense.fused_train(
        p0, cnt, rsum, sqsum, n, cfg.noise, steps=cfg.steps, lr=5e-3,
        mm_dtype="bfloat16", interpret=interpret)
    pred = (p["u"][0] @ p["v"][0].T + p["bu"][0][:, None]
            + p["bi"][0][None, :] + p["m"][0])
    rmse = float(jnp.sqrt(jnp.mean(
        (pred[users, items] - ratings) ** 2)))
    out_x = mf.run_dense(cfg, data=(users, items, ratings, None))
    loss_gap = (float(losses[-1]) - (-out_x["final_elbo"])) \
        / abs(out_x["final_elbo"])
    ok = rmse < 1.2 * cfg.noise and loss_gap < 0.01
    return _emit("matrix_fact_fused_vs_xla_dense", ok, rmse=rmse,
                 noise_floor=cfg.noise, loss_gap=loss_gap)


def selftest_fused_nuts(interpret):
    """The fused whole-transition NUTS kernel (ops/fused_nuts.py,
    VERDICT r3 item 2) through the full MCMC driver on a small DLGM
    local posterior: the Mosaic program must sample the same posterior
    as the per-chain XLA NUTS (marginal moments within MC error) with
    zero divergences and split-R-hat at 1.  This is the on-chip gate for
    the log-space-randomness / first-leaf-guard invariant — the failure
    mode it protects against (reduced-precision lane replication rounding
    a leaf uniform to 1.0, corrupting chain state) ONLY manifests on real
    TPU matmul hardware, never in interpret mode."""
    from bayesic_tpu.models import dlgm
    from bayesic_tpu.utils import diagnostics as diag

    cfg = dlgm.Config(num_data=512, data_dim=16, latent_dim=8, hidden=32,
                      num_chains=64, num_warmup=150, num_samples=150,
                      batch_size=128, steps=150)
    out = dlgm.run_svi(dlgm.Config(num_data=512, data_dim=16,
                                   latent_dim=8, hidden=32,
                                   batch_size=128, steps=150))
    args = (cfg, out["decoder"], out["decoder_params"], out["sigma_x"],
            out["x"][:16])
    mcmc_f = dlgm.local_posterior_mcmc_fused(
        *args, block_chains=32, interpret=interpret)
    res_f = mcmc_f.run(jax.random.PRNGKey(0))
    _, res_x = dlgm.local_posterior_mcmc(*args, jax.random.PRNGKey(1),
                                         shared_adapt=True)
    zf = np.asarray(res_f.unconstrained).reshape(-1, 16 * cfg.latent_dim)
    zx = np.asarray(res_x.unconstrained).reshape(-1, 16 * cfg.latent_dim)
    se = (zx.std(0) + zf.std(0)) / np.sqrt(zf.shape[0] / 4.0) + 0.02
    mean_err = float(np.abs(zf.mean(0) - zx.mean(0)).max())
    mean_gate = bool((np.abs(zf.mean(0) - zx.mean(0)) < 6 * se).all())
    sd_relerr = float(np.abs(zf.std(0) / zx.std(0) - 1.0).max())
    div = int(np.asarray(res_f.extra["diverging"]).sum())
    rhat = float(np.asarray(diag.split_rhat(res_f.unconstrained)).max())
    ok = mean_gate and sd_relerr < 0.3 and div == 0 and rhat < 1.02
    return _emit("fused_nuts", ok, mean_err=mean_err,
                 sd_relerr=sd_relerr, divergences=div, max_rhat=rhat)


def selftest_fused_nuts_hier(interpret):
    """The fused whole-transition NUTS kernel for hier-logistic
    (ops/fused_nuts_hier.py): the Mosaic program must sample the same
    posterior as the per-chain XLA NUTS on a mid-size centered config —
    marginal moments within MC error, split-R-hat at 1, divergence rate
    under 1%.  Exercises the PAD-LANE construction (auxiliary N(0,1)
    dims redrawn per transition) on real matmul hardware, which interpret
    mode cannot: reduced-precision lane replication is the failure mode
    the log-space-randomness convention guards against."""
    from bayesic_tpu.infer.mcmc import MCMC
    from bayesic_tpu.models import hier_logistic as hl
    from bayesic_tpu.utils import diagnostics as diag

    cfg = hl.Config(num_groups=16, obs_per_group=100, num_features=4,
                    seed=0)
    x, y, group, _ = hl.make_data(cfg)
    chains, warm, samp = 64, 200, 200
    mcmc_f = hl.fused_nuts_mcmc(
        cfg.num_groups, cfg.num_features, x, y, group, num_warmup=warm,
        num_samples=samp, num_chains=chains, block_chains=chains,
        interpret=interpret)
    res_f = mcmc_f.run(jax.random.PRNGKey(0))
    model = hl.make_model(cfg.num_groups, cfg.num_features, None,
                          centered=True)
    mcmc_x = MCMC(model=model, num_warmup=warm, num_samples=samp,
                  num_chains=chains, shared_adapt=True,
                  model_args=(x, y, group), target_accept=0.85)
    res_x = mcmc_x.run(jax.random.PRNGKey(1))
    f = np.asarray(res_f.unconstrained).reshape(-1,
                                                res_f.unconstrained.shape[-1])
    xs = np.asarray(res_x.unconstrained).reshape(f.shape[0], -1)
    se = (f.std(0) + xs.std(0)) / np.sqrt(f.shape[0] / 4.0) + 0.02
    mean_err = float(np.abs(f.mean(0) - xs.mean(0)).max())
    mean_gate = bool((np.abs(f.mean(0) - xs.mean(0)) < 6 * se).all())
    sd_relerr = float(np.abs(f.std(0) / xs.std(0) - 1.0).max())
    div = int(np.asarray(res_f.extra["diverging"]).sum())
    div_rate = div / float(samp * chains)
    rhat = float(np.asarray(diag.split_rhat(res_f.unconstrained)).max())
    ok = (mean_gate and sd_relerr < 0.3 and div_rate < 0.01
          and rhat < 1.02)
    return _emit("fused_nuts_hier", ok, mean_err=mean_err,
                 sd_relerr=sd_relerr, divergences=div, max_rhat=rhat)


def selftest_fused_smc_stage(interpret):
    """The whole-stage fused SMC mutation kernel (ops/fused_smc_gmm.py,
    VERDICT r4 item 5) through the full SMC driver on the smoke GMM: the
    Mosaic program must land the same log-evidence and predictive
    quality as the default XLA mutation path, with a healthy acceptance
    rate.  On TPU this exercises the real bf16 hi/lo value dots and the
    per-block dual-averaging scalars on hardware."""
    from bayesic_tpu.infer.smc import SMC
    from bayesic_tpu.models import gmm

    cfg = gmm.Config(num_data=500, num_particles=1024, mutation_steps=3,
                     leapfrog_steps=4, seed=0)
    x, _ = gmm.make_data(cfg)
    model = gmm.make_model(cfg, x)
    base = SMC(model, num_particles=cfg.num_particles,
               mutation_steps=cfg.mutation_steps,
               hmc_leapfrog_steps=cfg.leapfrog_steps)
    bm = gmm.make_batched_mutation(cfg, x,
                                   interpret=interpret or None)
    fused = SMC(model, num_particles=cfg.num_particles,
                mutation_steps=cfg.mutation_steps,
                hmc_leapfrog_steps=cfg.leapfrog_steps,
                batched_mutation=bm)
    # single-seed logZ carries ~+-8 MC noise even at 1024 particles (a
    # round-5 gate run measured gap 15.9 on one seed, 11.1 on another,
    # with predictive gaps ~1e-3): compare SEED-AVERAGED log-evidence
    seeds = (0, 1, 2)
    res_bs = [base.run(jax.random.PRNGKey(s)) for s in seeds]
    res_fs = [fused.run(jax.random.PRNGKey(s)) for s in seeds]
    res_b, res_f = res_bs[0], res_fs[0]
    lz_b = float(np.mean([float(r.log_evidence) for r in res_bs]))
    lz_f = float(np.mean([float(r.log_evidence) for r in res_fs]))
    logz_gap = abs(lz_f - lz_b)
    pred_b = gmm.predictive_loglik(res_b, x, cfg)
    pred_f = gmm.predictive_loglik(res_f, x, cfg)
    pred_gap = abs(pred_f - pred_b)
    acc = float(res_f.accept_rate)
    ok = logz_gap < 10.0 and pred_gap < 0.25 and 0.05 < acc <= 1.0
    return _emit("fused_smc_stage", ok, logz_gap=logz_gap,
                 pred_gap=pred_gap, accept=acc,
                 stages_fused=int(res_f.num_stages),
                 stages_base=int(res_b.num_stages))


def run_selftest():
    interpret = jax.default_backend() != "tpu"
    if interpret:
        _emit("mode", True, note="no TPU: interpret-mode fallback "
              "(validates plumbing, not the Mosaic/on-core-PRNG programs)")
    recs = [
        selftest_linreg(interpret),
        selftest_hier(interpret),
        selftest_matrix_fact(interpret),
        selftest_dlgm(interpret),
        selftest_fused_nuts(interpret),
        selftest_fused_nuts_hier(interpret),
        selftest_fused_smc_stage(interpret),
    ]
    ok = all(r["ok"] for r in recs)
    _emit("ALL", ok, passed=sum(r["ok"] for r in recs), total=len(recs),
          git_sha=_git_sha())
    return recs, ok


def _git_sha():
    """Stamp the artifact with the commit it tested (ADVICE r4: a stale
    selftest_rN.json must be detectable — r4's artifact predated the 6th
    gate and recorded 5/5 against a 6-gate suite)."""
    import os
    import subprocess

    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"
