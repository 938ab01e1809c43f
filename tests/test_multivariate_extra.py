"""Golden tests for the matrix-variate / heavy-tailed multivariate families
(SURVEY.md C1/§4.1): scipy golden log-densities, sampler moments vs analytic
moments, and the positive-definite bijector's ldj vs autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as sps

import bayesic_tpu.dist as dist
import bayesic_tpu.dist.transforms as tf

KEY = jax.random.PRNGKey(0)


def _chol(a):
    return jnp.asarray(np.linalg.cholesky(a))


def test_mvt_vs_scipy():
    cov = np.array([[2.0, 0.6], [0.6, 1.0]])
    loc = np.array([1.0, -1.0])
    df = 4.5
    d = dist.MultivariateStudentT(df, jnp.asarray(loc), _chol(cov))
    xs = np.array([[0.0, 0.0], [1.0, -1.0], [2.0, 3.0], [-4.0, 5.0]])
    want = sps.multivariate_t(loc, cov, df=df).logpdf(xs)
    np.testing.assert_allclose(np.asarray(d.log_prob(jnp.asarray(xs))),
                               want, rtol=1e-4)


def test_mvt_sampling_moments_and_reparam():
    cov = np.array([[1.5, -0.4], [-0.4, 0.8]])
    loc = np.array([0.5, 2.0])
    df = 7.0
    d = dist.MultivariateStudentT(df, jnp.asarray(loc), _chol(cov))
    xs = d.sample(KEY, (200_000,))
    np.testing.assert_allclose(np.asarray(xs.mean(0)), loc, atol=0.03)
    np.testing.assert_allclose(np.cov(np.asarray(xs).T),
                               df / (df - 2.0) * cov, rtol=0.05)
    np.testing.assert_allclose(np.asarray(d.variance),
                               df / (df - 2.0) * np.diag(cov), rtol=1e-5)
    assert d.reparametrized
    # pathwise gradient exists and is finite
    g = jax.grad(
        lambda s: jnp.sum(dist.MultivariateStudentT(
            df, jnp.asarray(loc), s * jnp.eye(2)).sample(KEY, (64,)) ** 2)
    )(1.0)
    assert np.isfinite(float(g))


def test_matrix_normal_vs_scipy():
    rng = np.random.default_rng(3)
    n, p = 3, 2
    loc = rng.normal(size=(n, p))
    a = rng.normal(size=(n, n))
    u = a @ a.T + n * np.eye(n)
    b = rng.normal(size=(p, p))
    v = b @ b.T + p * np.eye(p)
    d = dist.MatrixNormal(jnp.asarray(loc), _chol(u), _chol(v))
    xs = rng.normal(size=(5, n, p))
    want = sps.matrix_normal(loc, u, v).logpdf(xs)
    np.testing.assert_allclose(np.asarray(d.log_prob(jnp.asarray(xs))),
                               want, rtol=1e-4)
    # sampler second moments: Cov(vec X) = V (x) U
    samp = np.asarray(d.sample(KEY, (100_000,))).reshape(-1, n * p)
    got = np.cov(samp.T)
    want_cov = np.kron(u, v)  # row-major vec: U (x) V
    np.testing.assert_allclose(got, want_cov, atol=0.15,
                               rtol=0.05)
    np.testing.assert_allclose(np.asarray(d.variance),
                               np.outer(np.diag(u), np.diag(v)), rtol=1e-5)


def test_wishart_vs_scipy():
    s = np.array([[1.0, 0.3], [0.3, 0.7]])
    df = 5.5
    d = dist.Wishart(df, _chol(s))
    rng = np.random.default_rng(1)
    ws = np.stack([
        sps.wishart(df=6, scale=s).rvs(random_state=rng) for _ in range(4)
    ])
    want = sps.wishart(df=df, scale=s).logpdf(np.moveaxis(ws, 0, -1))
    np.testing.assert_allclose(np.asarray(d.log_prob(jnp.asarray(ws))),
                               want, rtol=1e-4)
    # Bartlett sampler: E[W] = df * S, Var(W_ij) = df (S_ij^2 + S_ii S_jj)
    samp = np.asarray(d.sample(KEY, (100_000,)))
    np.testing.assert_allclose(samp.mean(0), df * s, rtol=0.02)
    np.testing.assert_allclose(samp.var(0), np.asarray(d.variance),
                               rtol=0.05)


def test_inverse_wishart_vs_scipy():
    psi = np.array([[1.2, -0.2], [-0.2, 0.9]])
    df = 6.5
    d = dist.InverseWishart(df, _chol(psi))
    rng = np.random.default_rng(2)
    ws = np.stack([
        sps.invwishart(df=7, scale=psi).rvs(random_state=rng)
        for _ in range(4)
    ])
    want = sps.invwishart(df=df, scale=psi).logpdf(np.moveaxis(ws, 0, -1))
    np.testing.assert_allclose(np.asarray(d.log_prob(jnp.asarray(ws))),
                               want, rtol=1e-4)
    samp = np.asarray(d.sample(KEY, (200_000,)))
    np.testing.assert_allclose(samp.mean(0), psi / (df - 2.0 - 1.0),
                               rtol=0.03)
    np.testing.assert_allclose(samp.var(0), np.asarray(d.variance),
                               rtol=0.1)


def test_positive_definite_transform_roundtrip_and_ldj():
    t = tf.PositiveDefiniteTransform()
    u = jax.random.normal(jax.random.PRNGKey(5), (6,)) * 0.6  # m = 3
    w = t.forward(u)
    assert w.shape == (3, 3)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w).T, atol=1e-6)
    assert np.all(np.linalg.eigvalsh(np.asarray(w)) > 0)
    np.testing.assert_allclose(np.asarray(t.inverse(w)), np.asarray(u),
                               rtol=1e-4, atol=1e-5)

    idx = np.tril_indices(3)

    def free_coords(uu):
        return t.forward(uu)[idx]

    jac = jax.jacfwd(free_coords)(u)
    _, ld = np.linalg.slogdet(np.asarray(jac))
    np.testing.assert_allclose(float(t.log_det_jacobian(u)), ld, rtol=1e-4)


def test_wishart_latent_nuts_conjugate():
    """Precision ~ Wishart prior with Gaussian observations is conjugate:
    posterior is Wishart(df + n, (S^-1 + sum x x^T)^-1).  NUTS over the
    positive-definite latent (via PositiveDefiniteTransform) must match the
    analytic posterior mean within MC error."""
    from bayesic_tpu.core import sample
    from bayesic_tpu.infer.mcmc import MCMC

    rng = np.random.default_rng(0)
    dim, n = 2, 40
    s0 = np.eye(dim) * 0.5
    lam_true = np.array([[2.0, 0.6], [0.6, 1.5]])
    xs = rng.multivariate_normal(
        np.zeros(dim), np.linalg.inv(lam_true), size=n)
    xj = jnp.asarray(xs.astype(np.float32))
    df0 = 3.0

    def model():
        lam = sample("lam", dist.Wishart(df0, _chol(s0).astype(jnp.float32)))
        sample("obs",
               dist.MultivariateNormal(
                   jnp.zeros(dim),
                   scale_tril=jnp.linalg.cholesky(jnp.linalg.inv(lam)),
               ).expand((n,)).to_event(1),
               obs=xj)

    post_s = np.linalg.inv(np.linalg.inv(s0) + xs.T @ xs)
    post_mean = (df0 + n) * post_s

    r = MCMC(model=model, num_warmup=500, num_samples=500,
             num_chains=4).run(jax.random.PRNGKey(1))
    got = np.asarray(r.samples["lam"]).reshape(-1, dim, dim)
    se = got.std(0).max() / np.sqrt(got.shape[0] / 20.0)  # crude ESS floor
    np.testing.assert_allclose(got.mean(0), post_mean,
                               atol=max(3.0 * se, 0.08))
