"""LinearGaussianStateSpace: the sequential Kalman paths are checked
against a DENSE joint-Gaussian oracle (build the full (T*E, T*E)
observation covariance, condition exactly), and the parallel
associative-scan paths must match the sequential ones to float tolerance
— values AND gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import multivariate_normal

import bayesic_tpu.dist as dist


def _system(d=2, e=1, seed=0):
    rng = np.random.default_rng(seed)
    f = 0.9 * np.eye(d) + 0.05 * rng.standard_normal((d, d))
    q = 0.1 * np.eye(d)
    h = rng.standard_normal((e, d))
    r = 0.2 * np.eye(e)
    m0 = rng.standard_normal(d)
    p0 = np.eye(d)
    return m0, p0, f, q, h, r


def _dense_oracle(m0, p0, f, q, h, r, t_len):
    """Joint Gaussian of x_{0:T-1}: mean, cov, and the z-cross pieces."""
    d = m0.shape[0]
    covs = [p0]
    for _ in range(1, t_len):
        covs.append(f @ covs[-1] @ f.T + q)
    pz = np.zeros((t_len, d, t_len, d))
    for t in range(t_len):
        for s in range(t_len):
            if t <= s:
                pz[t, :, s, :] = covs[t] @ np.linalg.matrix_power(f, s - t).T
            else:
                pz[t, :, s, :] = np.linalg.matrix_power(f, t - s) @ covs[s]
    hb = np.kron(np.eye(t_len), h)
    cz = pz.reshape(t_len * d, t_len * d)
    cx = hb @ cz @ hb.T + np.kron(np.eye(t_len), r)
    mz = np.concatenate([np.linalg.matrix_power(f, t) @ m0
                         for t in range(t_len)])
    return mz, cz, hb @ mz, cx, cz @ hb.T


@pytest.mark.parametrize("method", ["sequential", "parallel"])
def test_log_prob_matches_dense_mvn(method):
    t_len = 7
    m0, p0, f, q, h, r = _system()
    lg = dist.LinearGaussianStateSpace(m0, p0, f, q, h, r, t_len,
                                       method=method)
    x = lg.sample(jax.random.PRNGKey(0))
    assert x.shape == (t_len, 1)
    _, _, mx, cx, _ = _dense_oracle(m0, p0, f, q, h, r, t_len)
    want = multivariate_normal.logpdf(np.asarray(x).ravel(), mx, cx)
    got = float(lg.log_prob(x))
    assert got == pytest.approx(want, rel=1e-4)


def test_parallel_equals_sequential_values_and_grads():
    """T=200, D=3, E=2: filtered marginals, log_prob, smoothed marginals,
    and d(log_prob)/d(transition_matrix) agree across the two schedules."""
    t_len = 200
    m0, p0, f, q, h, r = _system(d=3, e=2, seed=1)
    seq = dist.LinearGaussianStateSpace(m0, p0, f, q, h, r, t_len,
                                        method="sequential")
    par = dist.LinearGaussianStateSpace(m0, p0, f, q, h, r, t_len,
                                        method="parallel")
    x = seq.sample(jax.random.PRNGKey(1))

    ms_s, ps_s = seq.filter(x)
    ms_p, ps_p = par.filter(x)
    np.testing.assert_allclose(ms_p, ms_s, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ps_p, ps_s, rtol=1e-4, atol=1e-5)

    lp_s = float(seq.log_prob(x))
    lp_p = float(par.log_prob(x))
    assert lp_p == pytest.approx(lp_s, rel=1e-5)

    sm_s, sp_s = seq.smooth(x)
    sm_p, sp_p = par.smooth(x)
    np.testing.assert_allclose(sm_p, sm_s, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(sp_p, sp_s, rtol=1e-4, atol=1e-5)

    def lp_of_f(fm, method):
        return dist.LinearGaussianStateSpace(
            m0, p0, fm, q, h, r, t_len, method=method).log_prob(x)

    g_s = jax.grad(lambda fm: lp_of_f(fm, "sequential"))(jnp.asarray(f))
    g_p = jax.grad(lambda fm: lp_of_f(fm, "parallel"))(jnp.asarray(f))
    np.testing.assert_allclose(g_p, g_s, rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize("method", ["sequential", "parallel"])
def test_smooth_matches_joint_conditioning(method):
    t_len = 6
    m0, p0, f, q, h, r = _system(seed=2)
    lg = dist.LinearGaussianStateSpace(m0, p0, f, q, h, r, t_len,
                                       method=method)
    x = lg.sample(jax.random.PRNGKey(2))
    mz, cz, mx, cx, czx = _dense_oracle(m0, p0, f, q, h, r, t_len)
    mean_post = mz + czx @ np.linalg.solve(cx, np.asarray(x).ravel() - mx)
    cov_post = cz - czx @ np.linalg.solve(cx, czx.T)
    d = m0.shape[0]
    marg = cov_post.reshape(t_len, d, t_len, d)
    marg = np.stack([marg[t, :, t, :] for t in range(t_len)])

    sm, sp = lg.smooth(x)
    np.testing.assert_allclose(np.asarray(sm).ravel(), mean_post,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sp), marg, rtol=1e-4, atol=1e-5)


def test_posterior_sample_moments_match_smoother():
    t_len = 5
    m0, p0, f, q, h, r = _system(seed=3)
    lg = dist.LinearGaussianStateSpace(m0, p0, f, q, h, r, t_len)
    x = lg.sample(jax.random.PRNGKey(3))
    sm, sp = lg.smooth(x)
    zs = lg.posterior_sample(jax.random.PRNGKey(4), x, (40_000,))
    assert zs.shape == (40_000, t_len, 2)
    np.testing.assert_allclose(zs.mean(0), sm, atol=0.02)
    for t in range(t_len):
        emp = np.cov(np.asarray(zs)[:, t, :].T)
        np.testing.assert_allclose(emp, sp[t], atol=0.02)


def test_sample_moments_match_marginals():
    t_len = 4
    m0, p0, f, q, h, r = _system(seed=4)
    lg = dist.LinearGaussianStateSpace(m0, p0, f, q, h, r, t_len)
    xs = lg.sample(jax.random.PRNGKey(5), (60_000,))
    _, _, mx, cx, _ = _dense_oracle(m0, p0, f, q, h, r, t_len)
    np.testing.assert_allclose(np.asarray(xs.mean(0)).ravel(), mx, atol=0.03)
    emp = np.cov(np.asarray(xs).reshape(xs.shape[0], -1).T)
    np.testing.assert_allclose(emp, cx, atol=0.05)
    assert lg.mean.shape == (t_len, 1)
    np.testing.assert_allclose(np.asarray(lg.mean).ravel(), mx, rtol=1e-5)


def test_batched_log_prob_and_jit_boundary():
    t_len = 8
    m0, p0, f, q, h, r = _system(seed=5)
    lg = dist.LinearGaussianStateSpace(m0, p0, f, q, h, r, t_len)
    xs = lg.sample(jax.random.PRNGKey(6), (3, 2))
    lp = lg.log_prob(xs)
    assert lp.shape == (3, 2)
    one = lg.log_prob(xs[1, 0])
    assert float(lp[1, 0]) == pytest.approx(float(one), rel=1e-6)

    # pytree: distribution built OUTSIDE jit crosses the boundary
    @jax.jit
    def f_(d_, x_):
        return d_.log_prob(x_)

    assert float(f_(lg, xs[0, 0])) == pytest.approx(
        float(lg.log_prob(xs[0, 0])), rel=1e-6)


def test_mcmc_recovers_ar1_coefficient():
    """DSL integration: infer the AR(1) coefficient of a scalar LGSSM with
    NUTS; the posterior must cover the truth."""
    from bayesic_tpu.core import sample
    from bayesic_tpu.infer.mcmc import MCMC

    true_phi = 0.8
    t_len = 300
    gen = dist.LinearGaussianStateSpace(
        jnp.zeros(1), jnp.eye(1) * 2.0, jnp.eye(1) * true_phi,
        jnp.eye(1) * 1.0, jnp.eye(1), jnp.eye(1) * 0.25, t_len)
    x = gen.sample(jax.random.PRNGKey(7))

    def model():
        phi = sample("phi", dist.Uniform(-1.0, 1.0))
        lg = dist.LinearGaussianStateSpace(
            jnp.zeros(1), jnp.eye(1) * 2.0, jnp.eye(1) * phi,
            jnp.eye(1) * 1.0, jnp.eye(1), jnp.eye(1) * 0.25, t_len)
        sample("x", lg, obs=x)

    res = MCMC(model=model, num_warmup=300, num_samples=300,
               num_chains=4).run(jax.random.PRNGKey(8))
    draws = np.asarray(res.samples["phi"]).ravel()
    lo, hi = np.percentile(draws, [2.5, 97.5])
    assert lo < true_phi < hi
    assert abs(draws.mean() - true_phi) < 0.1


def test_validation_errors():
    with pytest.raises(ValueError, match="batched LGSSMs"):
        dist.LinearGaussianStateSpace(
            jnp.zeros((2, 2)), jnp.eye(2), jnp.eye(2), jnp.eye(2),
            jnp.eye(2), jnp.eye(2), 4)
    with pytest.raises(ValueError, match="observation_matrix"):
        dist.LinearGaussianStateSpace(
            jnp.zeros(2), jnp.eye(2), jnp.eye(2), jnp.eye(2),
            jnp.ones((1, 3)), jnp.eye(1), 4)
    with pytest.raises(ValueError, match="method"):
        dist.LinearGaussianStateSpace(
            jnp.zeros(2), jnp.eye(2), jnp.eye(2), jnp.eye(2),
            jnp.ones((1, 2)), jnp.eye(1), 4, method="bogus")
    lg = dist.LinearGaussianStateSpace(
        jnp.zeros(2), jnp.eye(2), jnp.eye(2), jnp.eye(2),
        jnp.ones((1, 2)), jnp.eye(1), 4)
    with pytest.raises(ValueError, match="event shape"):
        lg.log_prob(jnp.zeros((5, 1)))


@pytest.mark.parametrize("method", ["sequential", "parallel"])
def test_missing_observations_match_marginalized_dense_mvn(method):
    """observed_mask: the log-density must equal the dense joint Gaussian
    marginalized to the OBSERVED rows, for both filter formulations; NaNs
    at masked positions must not leak into value or gradient."""
    t_len = 8
    e = 1
    m0, p0, f, q, h, r = _system()
    mask = np.array([True, True, False, True, False, False, True, True])
    lg_full = dist.LinearGaussianStateSpace(m0, p0, f, q, h, r, t_len,
                                            method=method)
    x = lg_full.sample(jax.random.PRNGKey(3))

    lg = dist.LinearGaussianStateSpace(
        m0, p0, f, q, h, r, t_len, method=method,
        observed_mask=jnp.asarray(mask))
    _, _, mx, cx, _ = _dense_oracle(m0, p0, f, q, h, r, t_len)
    rows = np.repeat(mask, e)
    want = multivariate_normal.logpdf(
        np.asarray(x).ravel()[rows], mx[rows], cx[np.ix_(rows, rows)])
    got = float(lg.log_prob(x))
    assert got == pytest.approx(want, rel=1e-4)

    # NaN placeholders at missing slots: identical value, finite grad
    x_nan = np.asarray(x).copy()
    x_nan[~mask] = np.nan
    got_nan = float(lg.log_prob(jnp.asarray(x_nan)))
    assert got_nan == pytest.approx(got, rel=1e-6)

    def lp_of_f(fm):
        d2 = dist.LinearGaussianStateSpace(
            m0, p0, fm, q, h, r, t_len, method=method,
            observed_mask=jnp.asarray(mask))
        return d2.log_prob(jnp.asarray(x_nan))

    g = jax.grad(lp_of_f)(jnp.asarray(f))
    assert np.all(np.isfinite(np.asarray(g)))


def test_missing_observations_filter_and_smooth_consistent():
    """Parallel == sequential for the masked filter; the smoother at a
    missing time must match conditioning the dense joint on observed rows."""
    t_len = 8
    m0, p0, f, q, h, r = _system()
    mask = np.array([True, False, True, True, False, True, True, False])
    x = dist.LinearGaussianStateSpace(
        m0, p0, f, q, h, r, t_len).sample(jax.random.PRNGKey(5))

    lgs = dist.LinearGaussianStateSpace(
        m0, p0, f, q, h, r, t_len, method="sequential",
        observed_mask=jnp.asarray(mask))
    lgp = dist.LinearGaussianStateSpace(
        m0, p0, f, q, h, r, t_len, method="parallel",
        observed_mask=jnp.asarray(mask))
    ms_s, ps_s = lgs.filter(x)
    ms_p, ps_p = lgp.filter(x)
    np.testing.assert_allclose(np.asarray(ms_p), np.asarray(ms_s),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ps_p), np.asarray(ps_s),
                               rtol=1e-4, atol=1e-5)

    # smoothed z marginals == dense joint conditioning on observed rows
    mz, cz, mx, cx, czx = _dense_oracle(m0, p0, f, q, h, r, t_len)
    rows = np.asarray(mask)
    xo = np.asarray(x).ravel()[rows]
    sol = np.linalg.solve(cx[np.ix_(rows, rows)], xo - mx[rows])
    mz_post = mz + czx[:, rows] @ sol
    cz_post = cz - czx[:, rows] @ np.linalg.solve(
        cx[np.ix_(rows, rows)], czx[:, rows].T)
    sm, sp = lgs.smooth(x)
    d = m0.shape[0]
    np.testing.assert_allclose(np.asarray(sm).ravel(), mz_post,
                               rtol=1e-4, atol=1e-4)
    got_var = np.stack([np.diag(np.asarray(sp)[t]) for t in range(t_len)])
    want_var = np.diag(cz_post).reshape(t_len, d)
    np.testing.assert_allclose(got_var, want_var, rtol=1e-4, atol=1e-4)
