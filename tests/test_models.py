"""End-to-end smoke + oracle tests for the five reference example models
(SURVEY.md C16-C20, §4.8 determinism/regression)."""

import jax
import numpy as np
import pytest

from bayesic_tpu.models import dlgm, gmm, hier_logistic, linreg, matrix_fact


def test_linreg_analytic_oracle():
    out = linreg.run(linreg.Config(smoke=True))
    assert out["max_abs_err"] < 0.05
    assert np.isfinite(out["final_elbo"])


def test_linreg_fullrank():
    out = linreg.run(linreg.Config(smoke=True, guide="fullrank"))
    assert out["max_abs_err"] < 0.05


def test_hier_logistic_svi_nuts_cross_check():
    out = hier_logistic.run(hier_logistic.Config(smoke=True))
    # BASELINE acceptance proxy: backends agree on the pooled mean
    assert out["cross_check_gap"] < 0.35
    assert out["divergences"] <= 2
    assert out["nuts_rhat_mu"] < 1.1


def test_matrix_fact_reaches_noise_floor():
    out = matrix_fact.run(matrix_fact.Config(smoke=True))
    assert out["rmse"] < 1.4 * out["noise_floor"]
    assert np.isfinite(out["final_elbo"])


def test_gmm_smc_predictive_matches_truth():
    out = gmm.run(gmm.Config(smoke=True))
    # posterior predictive within a small gap of the generating mixture
    assert abs(out["gap"]) < 0.3
    assert out["num_stages"] >= 3


def test_dlgm_trains_and_nuts_mixes():
    out = dlgm.run(dlgm.Config(smoke=True))
    assert np.isfinite(out["final_elbo"])
    # ELBO improved over training
    assert out["losses"][-1] < out["losses"][0]
    assert out["nuts_divergences"] == 0
    assert out["nuts_min_ess"] > 20


def test_dlgm_linear_decoder_matches_analytic_posterior():
    """With a *linear* decoder the z-posterior is exactly Gaussian: NUTS must
    reproduce it (SURVEY.md C24 oracle)."""
    import jax.numpy as jnp

    import bayesic_tpu.dist as dist
    from bayesic_tpu.core import sample
    from bayesic_tpu.infer.mcmc import MCMC

    rng = np.random.default_rng(0)
    dz, dx = 3, 6
    w = rng.normal(0, 1, (dz, dx)).astype(np.float32)
    sigma = 0.4
    z_true = rng.normal(0, 1, dz).astype(np.float32)
    x = (z_true @ w + rng.normal(0, sigma, dx)).astype(np.float32)
    wj, xj = jnp.asarray(w), jnp.asarray(x)

    def model():
        z = sample("z", dist.Normal(0.0, 1.0).expand((dz,)).to_event(1))
        sample("obs", dist.Normal(z @ wj, sigma).to_event(1), obs=xj)

    mcmc = MCMC(model=model, num_warmup=400, num_samples=600, num_chains=4,
                init_step_size=0.3)
    res = mcmc.run(jax.random.PRNGKey(1))
    zs = np.asarray(res.samples["z"]).reshape(-1, dz)

    prec = np.eye(dz) + w @ w.T / sigma**2
    cov = np.linalg.inv(prec)
    mean = cov @ (w @ x) / sigma**2
    np.testing.assert_allclose(zs.mean(0), mean, atol=0.06)
    np.testing.assert_allclose(np.cov(zs.T), cov, atol=0.06)


def test_three_backend_cross_check():
    """SURVEY.md §4.4 / BASELINE acceptance rule on configs[1]: SVI,
    NUTS, and SMC posterior means agree pairwise within MC error."""
    import jax.numpy as jnp
    import optax

    import bayesic_tpu.dist as dist
    from bayesic_tpu.core import sample
    from bayesic_tpu.infer.mcmc import MCMC
    from bayesic_tpu.infer.smc import SMC
    from bayesic_tpu.infer.svi import SVI, MeanFieldGuide
    from bayesic_tpu.utils import diagnostics as diag

    rng = np.random.default_rng(0)
    j, npg = 6, 40
    theta_true = rng.normal(0.5, 1.0, j)
    group = np.repeat(np.arange(j), npg)
    yv = (rng.uniform(size=j * npg)
          < 1 / (1 + np.exp(-theta_true[group]))).astype(np.int32)
    yj, gj = jnp.asarray(yv), jnp.asarray(group)

    def model():
        mu = sample("mu", dist.Normal(0.0, 5.0))
        tau = sample("tau", dist.HalfNormal(2.0))
        raw = sample("raw", dist.Normal(0.0, 1.0).expand((j,)).to_event(1))
        theta = mu + tau * raw
        sample("obs", dist.Bernoulli(logits=theta[gj]).to_event(1), obs=yj)

    # NUTS (the reference chain)
    mres = MCMC(model=model, num_warmup=400, num_samples=400, num_chains=4,
                target_accept=0.9).run(jax.random.PRNGKey(0))
    s = diag.summary({"mu": mres.samples["mu"]})["mu"]
    mu_nuts, mcse = float(s["mean"]), float(s["mcse"])

    # SVI
    svi = SVI(model, MeanFieldGuide,
              optax.adam(optax.cosine_decay_schedule(0.05, 2000)))
    res = svi.run(jax.random.PRNGKey(1), 2000)
    mu_svi = float(svi.guide.stats(res.params)[0]["mu"])

    # SMC
    smc = SMC(model, num_particles=2048, mutation_steps=4,
              hmc_leapfrog_steps=5)
    sres = smc.run(jax.random.PRNGKey(2))
    w = jnp.exp(sres.log_weights)
    mu_smc = float((w * sres.particles["mu"]).sum())

    # pairwise agreement: generous multiples of MCSE + guide-bias allowance
    assert abs(mu_nuts - mu_smc) < 6 * mcse + 0.1, (mu_nuts, mu_smc)
    assert abs(mu_nuts - mu_svi) < 6 * mcse + 0.15, (mu_nuts, mu_svi)
