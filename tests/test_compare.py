"""Model-comparison stack: pointwise log_likelihood, WAIC, PSIS-LOO
(SURVEY.md C21 periphery; test strategy §4.1/4.3 — analytic golden values
and a conjugate exact-LOO oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as st

import bayesic_tpu.dist as dist
from bayesic_tpu.core import plate, sample
from bayesic_tpu.infer import log_likelihood
from bayesic_tpu.utils.compare import (
    ELPDResult,
    _gpd_fit,
    compare,
    psis_loo,
    waic,
)


def test_log_likelihood_pointwise_analytic():
    x = jnp.asarray([0.5, -1.0, 2.0, 0.0])
    y = jnp.asarray([0.2, 0.4, 1.5, -0.3])
    sigma = 0.5

    def model(x, y):
        w = sample("w", dist.Normal(0.0, 1.0))
        with plate("data", x.shape[0]):
            sample("obs", dist.Normal(w * x, sigma), obs=y)

    ws = jnp.asarray([0.1, -0.3, 0.7])
    ll = log_likelihood(model, {"w": ws}, model_args=(x, y))
    assert set(ll) == {"obs"}
    assert ll["obs"].shape == (3, 4)
    expect = st.norm.logpdf(np.asarray(y)[None, :],
                            np.asarray(ws)[:, None] * np.asarray(x)[None, :],
                            sigma)
    np.testing.assert_allclose(np.asarray(ll["obs"]), expect, rtol=1e-5)


def test_log_likelihood_latent_not_in_samples_uses_prior():
    y = jnp.asarray([0.2, 0.4])

    def model(y):
        mu = sample("mu", dist.Normal(0.0, 1.0))
        tau = sample("tau", dist.HalfNormal(1.0))
        sample("obs", dist.Normal(mu, tau).expand((2,)).to_event(1), obs=y)

    # only mu provided: tau drawn from its prior per sample, shapes still ok
    ll = log_likelihood(model, {"mu": jnp.zeros(5)}, model_args=(y,),
                        key=jax.random.PRNGKey(3))
    assert ll["obs"].shape == (5,)
    assert np.all(np.isfinite(np.asarray(ll["obs"])))


def test_waic_formula_golden():
    rng = np.random.default_rng(0)
    ll = rng.normal(-1.0, 0.3, size=(200, 17))
    r = waic(ll)
    lppd_i = np.log(np.mean(np.exp(ll), axis=0))
    p_i = np.var(ll, axis=0, ddof=1)
    np.testing.assert_allclose(r.pointwise, lppd_i - p_i, rtol=1e-10)
    np.testing.assert_allclose(r.elpd, np.sum(lppd_i - p_i), rtol=1e-10)
    np.testing.assert_allclose(r.p_eff, p_i.sum(), rtol=1e-10)
    np.testing.assert_allclose(
        r.se, np.sqrt(17 * np.var(lppd_i - p_i, ddof=1)), rtol=1e-10)


def test_gpd_fit_recovers_shape():
    rng = np.random.default_rng(42)
    k_true, sigma_true = 0.25, 1.3
    u = rng.uniform(size=4000)
    x = np.sort(sigma_true * np.expm1(-k_true * np.log1p(-u)) / k_true)
    k_hat, sigma_hat = _gpd_fit(x)
    assert abs(k_hat - k_true) < 0.1
    assert abs(sigma_hat - sigma_true) / sigma_true < 0.15


def _normal_normal_setup(seed=1, n=30, s=4000, tau0=2.0, sigma=1.0):
    """Conjugate N(0,tau0) prior on mu, y_i ~ N(mu, sigma): returns
    (ll matrix from exact posterior draws, exact LOO elpd)."""
    rng = np.random.default_rng(seed)
    y = rng.normal(0.7, sigma, size=n)

    def post(ys):
        prec = 1.0 / tau0**2 + len(ys) / sigma**2
        mean = (ys.sum() / sigma**2) / prec
        return mean, np.sqrt(1.0 / prec)

    mu_n, s_n = post(y)
    draws = rng.normal(mu_n, s_n, size=s)
    ll = st.norm.logpdf(y[None, :], draws[:, None], sigma)

    exact = 0.0
    for i in range(n):
        m_i, s_i = post(np.delete(y, i))
        exact += st.norm.logpdf(y[i], m_i, np.sqrt(s_i**2 + sigma**2))
    return ll, exact


def test_psis_loo_matches_exact_conjugate_loo():
    ll, exact = _normal_normal_setup()
    r = psis_loo(ll)
    assert isinstance(r, ELPDResult)
    assert r.pareto_k is not None and np.all(r.pareto_k < 0.7)
    # one-parameter model: p_eff ~ 1
    assert 0.3 < r.p_eff < 3.0
    # elpd within a few MC standard errors of the exact leave-one-out value
    assert abs(r.elpd - exact) < 0.5, (r.elpd, exact)


def test_waic_and_loo_agree_on_wellbehaved_model():
    ll, _ = _normal_normal_setup(seed=7)
    assert abs(waic(ll).elpd - psis_loo(ll).elpd) < 0.3


def test_compare_ranks_true_model_first():
    rng = np.random.default_rng(3)
    n, s, sigma = 40, 2000, 1.0
    y = rng.normal(0.0, sigma, size=n)
    draws = rng.normal(y.mean(), sigma / np.sqrt(n), size=s)
    ll_good = st.norm.logpdf(y[None, :], draws[:, None], sigma)
    ll_bad = st.norm.logpdf(y[None, :], draws[:, None] + 3.0, sigma)
    rows = compare({"good": psis_loo(ll_good), "bad": psis_loo(ll_bad)})
    assert [r["name"] for r in rows] == ["good", "bad"]
    assert rows[0]["d_elpd"] == 0.0
    assert rows[1]["d_elpd"] > 5 * max(rows[1]["d_se"], 1e-9)


def test_compare_rejects_mismatched_data():
    rng = np.random.default_rng(5)
    a = waic(rng.normal(size=(50, 10)))
    b = waic(rng.normal(size=(50, 11)))
    import pytest

    with pytest.raises(ValueError):
        compare({"a": a, "b": b})
