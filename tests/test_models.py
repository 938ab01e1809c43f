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
