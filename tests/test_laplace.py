"""MAP + Laplace approximation tests (SURVEY.md §4.3): on linear-Gaussian
models the Laplace approximation is EXACT — mode, covariance, and evidence
all have closed forms, giving a hard oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as st

import bayesic_tpu.dist as dist
from bayesic_tpu.core import sample
from bayesic_tpu.infer.laplace import Laplace, map_estimate

KEY = jax.random.PRNGKey(0)


def _linreg_setup(seed=1, n=40, sigma=0.5, prior_sd=2.0):
    rng = np.random.default_rng(seed)
    x = rng.normal(0.0, 1.0, n).astype(np.float32) + 0.5
    y = (1.2 * x - 0.4 + rng.normal(0, sigma, n)).astype(np.float32)
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def model():
        w = sample("w", dist.Normal(0.0, prior_sd))
        b = sample("b", dist.Normal(0.0, prior_sd))
        sample("obs", dist.Normal(w * xj + b, sigma).to_event(1), obs=yj)

    # flat-vector order is the sorted site order ("b", "w") -> columns (1, x)
    X = np.stack([np.ones_like(x), x], 1).astype(np.float64)
    prec = X.T @ X / sigma**2 + np.eye(2) / prior_sd**2
    cov = np.linalg.inv(prec)
    mean = cov @ (X.T @ y.astype(np.float64)) / sigma**2
    # analytic evidence: y ~ N(0, sigma^2 I + prior_sd^2 X X^T)
    log_z = st.multivariate_normal.logpdf(
        y.astype(np.float64), np.zeros(n),
        sigma**2 * np.eye(n) + prior_sd**2 * (X @ X.T))
    return model, mean, cov, log_z


def test_map_finds_posterior_mode():
    model, mean, _, _ = _linreg_setup()
    res = map_estimate(model, num_steps=2000, key=KEY)
    np.testing.assert_allclose(
        [float(res.uparams["b"]), float(res.uparams["w"])], mean, atol=5e-3)
    assert np.isfinite(float(res.log_joint))
    assert np.asarray(res.losses)[-1] < np.asarray(res.losses)[0]


def test_laplace_exact_on_linear_gaussian():
    model, mean, cov, log_z = _linreg_setup()
    lap = Laplace(model).fit(key=KEY, num_steps=3000)
    np.testing.assert_allclose(np.asarray(lap.mean), mean, atol=5e-3)
    np.testing.assert_allclose(np.asarray(lap.cov), cov,
                               rtol=0.02, atol=1e-5)
    assert abs(lap.log_evidence - log_z) < 0.02, (lap.log_evidence, log_z)


def test_laplace_posterior_samples_match_moments():
    model, mean, cov, _ = _linreg_setup()
    lap = Laplace(model).fit(key=KEY, num_steps=3000)
    draws = lap.sample_posterior(jax.random.PRNGKey(5), 20_000)
    assert set(draws) == {"w", "b"}
    got_mean = [float(jnp.mean(draws["b"])), float(jnp.mean(draws["w"]))]
    np.testing.assert_allclose(got_mean, mean, atol=0.03)
    got_var = [float(jnp.var(draws["b"])), float(jnp.var(draws["w"]))]
    np.testing.assert_allclose(got_var, np.diag(cov), rtol=0.1)


def test_laplace_constrained_site_stays_in_support():
    rng = np.random.default_rng(2)
    y = jnp.asarray(np.abs(rng.normal(0, 1.3, 80)).astype(np.float32))

    def model():
        s = sample("s", dist.HalfNormal(5.0))
        sample("obs", dist.HalfNormal(s).expand((80,)).to_event(1), obs=y)

    lap = Laplace(model).fit(key=KEY, num_steps=2000)
    draws = lap.sample_posterior(jax.random.PRNGKey(1), 4000)
    assert np.all(np.asarray(draws["s"]) > 0)
    assert np.isfinite(lap.log_evidence)
