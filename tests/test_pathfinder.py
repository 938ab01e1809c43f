"""Pathfinder (infer/pathfinder.py): on a Gaussian posterior the L-BFGS
inverse-Hessian Gaussian is exact, so the draws must match the analytic
posterior and the PSIS diagnostic must be clean."""

import jax
import jax.numpy as jnp
import numpy as np

import bayesic_tpu.dist as dist
from bayesic_tpu.core import sample
from bayesic_tpu.infer.pathfinder import pathfinder


def _linreg_setup():
    rng = np.random.default_rng(1)
    n = 60
    x = rng.normal(0.0, 1.0, n).astype(np.float32) + 1.0
    sigma = 0.5
    y = (1.5 * x - 0.7 + rng.normal(0, sigma, n)).astype(np.float32)
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def model():
        w = sample("w", dist.Normal(0.0, 2.0))
        b = sample("b", dist.Normal(0.0, 2.0))
        sample("obs", dist.Normal(w * xj + b, sigma).to_event(1), obs=yj)

    X = np.stack([x, np.ones_like(x)], 1)
    prec = X.T @ X / sigma**2 + np.eye(2) / 4.0
    cov = np.linalg.inv(prec)
    mean = cov @ (X.T @ y) / sigma**2
    return model, mean, cov


def test_gaussian_posterior_exact():
    model, mean, cov = _linreg_setup()
    res = pathfinder(model, jax.random.PRNGKey(0), num_paths=4,
                     maxiter=40, num_samples=4000)
    got = np.stack([np.asarray(res.samples["w"]),
                    np.asarray(res.samples["b"])], 1)
    np.testing.assert_allclose(got.mean(0), mean, atol=0.03)
    np.testing.assert_allclose(np.cov(got.T), cov, rtol=0.25, atol=2e-4)
    # exact proposal -> flat importance weights -> tiny pareto k
    assert res.pareto_k < 0.7
    # the reported best ELBO approximates log Z (KL -> 0 on a Gaussian)
    from scipy.stats import multivariate_normal
    # log Z = log N(y; 0, X cov_prior X^T + sigma^2 I) — compute via the
    # evidence identity logZ = logp(theta) - log post(theta) at theta=mean
    # using the analytic posterior
    rng = np.random.default_rng(1)
    n = 60
    x = rng.normal(0.0, 1.0, n).astype(np.float32) + 1.0
    sigma = 0.5
    y = (1.5 * x - 0.7 + rng.normal(0, sigma, n)).astype(np.float32)
    X = np.stack([x, np.ones_like(x)], 1)
    big_cov = X @ (4.0 * np.eye(2)) @ X.T + sigma**2 * np.eye(n)
    log_z = multivariate_normal(np.zeros(n), big_cov).logpdf(y)
    np.testing.assert_allclose(np.asarray(res.elbo), log_z, atol=0.1)


def test_positive_scale_site():
    """Constrained (positive) site: pathfinder works in unconstrained
    space and returns constrained draws near the conjugate posterior."""
    rng = np.random.default_rng(3)
    n = 400
    y = jnp.asarray(rng.normal(0.0, 2.0, n).astype(np.float32))

    def model():
        var = sample("var", dist.InverseGamma(3.0, 3.0))
        sample("obs", dist.Normal(0.0, jnp.sqrt(var)).expand((n,))
               .to_event(1), obs=y)

    a_n = 3.0 + n / 2.0
    b_n = 3.0 + float(jnp.sum(y * y)) / 2.0
    post_mean = b_n / (a_n - 1.0)
    res = pathfinder(model, jax.random.PRNGKey(1), num_paths=2,
                     maxiter=40, num_samples=4000)
    got = float(jnp.mean(res.samples["var"]))
    np.testing.assert_allclose(got, post_mean, rtol=0.05)
    assert res.pareto_k < 0.7


def test_pathfinder_warm_starts_mcmc():
    """Pathfinder draws feed MCMC(init_params=...): a short-warmup NUTS run
    from the pathfinder approximation matches the analytic posterior."""
    from bayesic_tpu.infer.mcmc import MCMC

    model, mean, cov = _linreg_setup()
    pf = pathfinder(model, jax.random.PRNGKey(2), num_paths=2,
                    maxiter=40, num_samples=64)
    assert pf.unconstrained.shape == (64, 2)
    m = MCMC(model=model, num_warmup=150, num_samples=400, num_chains=8,
             init_params=pf.unconstrained[:8])
    r = m.run(jax.random.PRNGKey(3))
    got = np.stack([
        np.asarray(r.samples["w"]).reshape(-1),
        np.asarray(r.samples["b"]).reshape(-1),
    ], 1)
    np.testing.assert_allclose(got.mean(0), mean, atol=0.04)
    np.testing.assert_allclose(np.cov(got.T), cov, rtol=0.35, atol=3e-4)


def test_all_paths_failed_raises_clear_error():
    """ADVICE r3: when every pooled draw has a non-finite importance
    weight (target density non-finite everywhere), pathfinder must raise a
    diagnostic ValueError, not feed NaN probabilities to the resampler."""
    import pytest

    bad = jnp.asarray([jnp.nan, jnp.nan])

    def model():
        mu = sample("mu", dist.Normal(0.0, 1.0))
        sample("obs", dist.Normal(mu + jnp.zeros(2), 1.0).to_event(1),
               obs=bad)

    with pytest.raises(ValueError, match="all paths failed"):
        pathfinder(model, jax.random.PRNGKey(0), num_paths=2,
                   maxiter=10, num_samples=16)


def test_seed_rows_distinct_without_replacement():
    """The first num_chains rows of `unconstrained` seed MCMC chains —
    with a healthy pool they must be drawn without replacement (no two
    chains starting from the identical point)."""
    model, _, _ = _linreg_setup()
    res = pathfinder(model, jax.random.PRNGKey(3), num_paths=4,
                     maxiter=40, num_samples=64)
    rows = np.asarray(res.unconstrained)
    assert np.unique(rows, axis=0).shape[0] == rows.shape[0]
