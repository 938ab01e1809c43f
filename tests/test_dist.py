"""Distribution unit tests (SURVEY.md §4.1): log_prob vs scipy.stats golden
values; sample moments vs analytic moments."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

import bayesic_tpu.dist as dist

KEY = jax.random.PRNGKey(0)


def assert_close(a, b, rtol=1e-5, atol=1e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol,
                               atol=atol)


CASES = [
    (dist.Normal(0.5, 2.0), sps.norm(0.5, 2.0), np.linspace(-5, 5, 11)),
    (dist.LogNormal(0.3, 0.8), sps.lognorm(s=0.8, scale=np.exp(0.3)),
     np.linspace(0.1, 5, 9)),
    (dist.HalfNormal(1.5), sps.halfnorm(scale=1.5), np.linspace(0.1, 4, 9)),
    (dist.Cauchy(-1.0, 0.7), sps.cauchy(-1.0, 0.7), np.linspace(-5, 5, 11)),
    (dist.HalfCauchy(2.0), sps.halfcauchy(scale=2.0), np.linspace(0.1, 6, 9)),
    (dist.StudentT(4.0, 1.0, 2.0), sps.t(df=4.0, loc=1.0, scale=2.0),
     np.linspace(-5, 5, 11)),
    (dist.Laplace(0.2, 1.3), sps.laplace(0.2, 1.3), np.linspace(-4, 4, 9)),
    (dist.Exponential(2.5), sps.expon(scale=1 / 2.5), np.linspace(0.1, 3, 9)),
    (dist.Gamma(3.0, 2.0), sps.gamma(a=3.0, scale=1 / 2.0),
     np.linspace(0.1, 5, 9)),
    (dist.InverseGamma(3.0, 2.0), sps.invgamma(a=3.0, scale=2.0),
     np.linspace(0.1, 5, 9)),
    (dist.Beta(2.0, 3.0), sps.beta(2.0, 3.0), np.linspace(0.05, 0.95, 9)),
    (dist.Uniform(-1.0, 3.0), sps.uniform(-1.0, 4.0), np.linspace(-0.5, 2.5, 7)),
]


@pytest.mark.parametrize("d,ref,xs", CASES,
                         ids=[type(c[0]).__name__ for c in CASES])
def test_logprob_vs_scipy(d, ref, xs):
    # f32 special functions (gammaln &c) are good to ~1e-3 relative
    assert_close(d.log_prob(jnp.asarray(xs)), ref.logpdf(xs), rtol=2e-3,
                 atol=2e-3)


def test_discrete_logprob_vs_scipy():
    xs = np.array([0, 1])
    assert_close(dist.Bernoulli(probs=0.3).log_prob(jnp.asarray(xs)),
                 sps.bernoulli(0.3).logpmf(xs), rtol=1e-5)
    xs = np.arange(0, 11)
    assert_close(dist.Binomial(10, probs=0.4).log_prob(jnp.asarray(xs)),
                 sps.binom(10, 0.4).logpmf(xs), rtol=1e-4, atol=1e-4)
    xs = np.arange(0, 8)
    assert_close(dist.Poisson(2.5).log_prob(jnp.asarray(xs)),
                 sps.poisson(2.5).logpmf(xs), rtol=1e-5, atol=1e-5)
    probs = np.array([0.2, 0.3, 0.5])
    xs = np.array([0, 1, 2])
    assert_close(dist.Categorical(probs=probs).log_prob(jnp.asarray(xs)),
                 np.log(probs), rtol=1e-5)


def test_mvn_vs_scipy():
    cov = np.array([[2.0, 0.6], [0.6, 1.0]])
    loc = np.array([1.0, -1.0])
    d = dist.MultivariateNormal(loc, covariance_matrix=jnp.asarray(cov))
    xs = np.array([[0.0, 0.0], [1.0, -1.0], [2.0, 3.0]])
    assert_close(d.log_prob(jnp.asarray(xs)),
                 sps.multivariate_normal(loc, cov).logpdf(xs), rtol=1e-4)
    # entropy
    assert_close(d.entropy(), sps.multivariate_normal(loc, cov).entropy(),
                 rtol=1e-5)


def test_dirichlet_vs_scipy():
    conc = np.array([2.0, 3.0, 1.5])
    d = dist.Dirichlet(jnp.asarray(conc))
    xs = np.array([[0.2, 0.5, 0.3], [0.6, 0.2, 0.2]])
    assert_close(d.log_prob(jnp.asarray(xs)),
                 sps.dirichlet(conc).logpdf(xs.T), rtol=1e-4)


def test_truncated_normal_vs_scipy():
    d = dist.TruncatedNormal(0.5, 1.2, low=-1.0, high=2.0)
    ref = sps.truncnorm(a=(-1.0 - 0.5) / 1.2, b=(2.0 - 0.5) / 1.2,
                        loc=0.5, scale=1.2)
    xs = np.linspace(-0.9, 1.9, 9)
    assert_close(d.log_prob(jnp.asarray(xs)), ref.logpdf(xs), rtol=1e-4,
                 atol=1e-4)


MOMENT_CASES = [
    dist.Normal(0.5, 2.0),
    dist.LogNormal(0.3, 0.5),
    dist.Gamma(3.0, 2.0),
    dist.Beta(2.0, 3.0),
    dist.Exponential(2.5),
    dist.Laplace(0.2, 1.3),
    dist.Uniform(-1.0, 3.0),
]


@pytest.mark.parametrize("d", MOMENT_CASES,
                         ids=[type(d).__name__ for d in MOMENT_CASES])
def test_sample_moments(d):
    n = 200_000
    x = d.sample(jax.random.PRNGKey(3), (n,))
    se = np.sqrt(np.asarray(d.variance) / n)
    assert abs(np.mean(np.asarray(x)) - np.asarray(d.mean)) < 5 * se
    assert np.allclose(np.var(np.asarray(x)), np.asarray(d.variance),
                       rtol=0.05)


def test_mixture_logprob_and_sampling():
    mix = dist.Categorical(probs=jnp.array([0.3, 0.7]))
    comps = dist.Normal(jnp.array([-2.0, 2.0]), jnp.array([0.5, 1.0]))
    d = dist.MixtureSameFamily(mix, comps)
    xs = np.linspace(-4, 4, 9)
    ref = np.log(0.3 * sps.norm(-2.0, 0.5).pdf(xs)
                 + 0.7 * sps.norm(2.0, 1.0).pdf(xs))
    assert_close(d.log_prob(jnp.asarray(xs)), ref, rtol=1e-4, atol=1e-4)
    x = d.sample(jax.random.PRNGKey(5), (100_000,))
    assert abs(float(jnp.mean(x)) - float(d.mean)) < 0.05


def test_mixture_mvn_components():
    locs = jnp.array([[-1.0, 0.0], [2.0, 1.0]])
    trils = jnp.broadcast_to(jnp.eye(2) * 0.5, (2, 2, 2))
    mix = dist.Categorical(probs=jnp.array([0.4, 0.6]))
    d = dist.MixtureSameFamily(
        mix, dist.MultivariateNormal(locs, scale_tril=trils)
    )
    x = jnp.array([0.0, 0.0])
    ref = np.log(
        0.4 * sps.multivariate_normal([-1.0, 0.0], 0.25 * np.eye(2)).pdf([0, 0])
        + 0.6 * sps.multivariate_normal([2.0, 1.0], 0.25 * np.eye(2)).pdf([0, 0])
    )
    assert_close(d.log_prob(x), ref, rtol=1e-4)
    s = d.sample(jax.random.PRNGKey(1), (7,))
    assert s.shape == (7, 2)


def test_lkj_d2_density_integrates():
    """d=2: density over rho must integrate to 1 and equal the analytic LKJ."""
    eta = 1.7
    d = dist.LKJCholesky(2, eta)
    rho = np.linspace(-0.999, 0.999, 2001)
    ls = np.zeros((rho.size, 2, 2))
    ls[:, 0, 0] = 1.0
    ls[:, 1, 0] = rho
    ls[:, 1, 1] = np.sqrt(1.0 - rho**2)
    lp = np.asarray(d.log_prob(jnp.asarray(ls)))
    integral = np.trapezoid(np.exp(lp), rho)
    assert abs(integral - 1.0) < 1e-3
    # analytic: p(rho) = (1-rho^2)^(eta-1) / Z
    from scipy.special import gammaln as gl
    log_z = 0.5 * np.log(np.pi) + gl(eta) - gl(eta + 0.5)
    ref = (eta - 1.0) * np.log1p(-rho**2) - log_z
    np.testing.assert_allclose(lp, ref, rtol=1e-4, atol=1e-4)


def test_lkj_sampling_properties():
    d = dist.LKJCholesky(4, 2.0)
    ls = d.sample(jax.random.PRNGKey(7), (5000,))
    # valid cholesky-of-correlation: unit row norms, positive diag, lower-tri
    norms = np.asarray(jnp.sum(ls * ls, -1))
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    assert np.all(np.asarray(jnp.diagonal(ls, axis1=-2, axis2=-1)) > 0)
    assert np.allclose(np.asarray(jnp.triu(ls, 1)), 0.0)
    # E[rho_ij] = 0 by symmetry
    corr = np.asarray(jnp.einsum("...ij,...kj->...ik", ls, ls))
    off = corr[:, 1, 0]
    assert abs(off.mean()) < 0.02
    # marginal rho ~ Beta-shaped with var = 1/(2*eta + d - 1)? sanity: bounded
    assert np.all(np.abs(off) <= 1.0)


def test_independent_and_event_shapes():
    d = dist.Normal(jnp.zeros((3, 4)), 1.0).to_event(1)
    assert d.batch_shape == (3,) and d.event_shape == (4,)
    x = d.sample(KEY)
    assert x.shape == (3, 4)
    assert d.log_prob(x).shape == (3,)
    full = dist.Normal(jnp.zeros((3, 4)), 1.0).log_prob(x).sum(-1)
    assert_close(d.log_prob(x), full)


def test_expand():
    d = dist.Normal(0.0, 1.0).expand((5, 2))
    assert d.batch_shape == (5, 2)
    assert d.sample(KEY).shape == (5, 2)
    m = dist.MultivariateNormal(jnp.zeros(3), scale_tril=jnp.eye(3))
    me = m.expand((4,))
    assert me.batch_shape == (4,) and me.event_shape == (3,)
    assert me.sample(KEY).shape == (4, 3)


def test_distributions_are_pytrees():
    d = dist.Normal(jnp.array([0.0, 1.0]), jnp.array([1.0, 2.0]))
    mapped = jax.tree_util.tree_map(lambda x: x * 2, d)
    assert isinstance(mapped, dist.Normal)
    assert_close(mapped.loc, [0.0, 2.0])

    @jax.jit
    def f(d, x):
        return d.log_prob(x)

    assert f(d, jnp.zeros(2)).shape == (2,)


def test_vmap_over_distribution_params():
    locs = jnp.arange(4.0)

    def lp(loc, x):
        return dist.Normal(loc, 1.0).log_prob(x)

    out = jax.vmap(lp, in_axes=(0, None))(locs, 0.5)
    assert out.shape == (4,)


def test_reparam_gradients():
    """Pathwise gradient of E[x] wrt loc should be ~1 for Normal."""

    def mean_est(loc):
        d = dist.Normal(loc, 1.0)
        return jnp.mean(d.sample(jax.random.PRNGKey(0), (4096,)))

    g = jax.grad(mean_est)(0.3)
    assert abs(float(g) - 1.0) < 1e-4

    def gamma_mean(conc):
        return jnp.mean(dist.Gamma(conc, 1.0).sample(jax.random.PRNGKey(0),
                                                     (4096,)))

    g = jax.grad(gamma_mean)(3.0)  # d/da E[Gamma(a,1)] = 1
    assert abs(float(g) - 1.0) < 0.05


def test_new_families_vs_scipy():
    xs = np.linspace(0.2, 6.0, 9)
    assert_close(dist.Weibull(2.0, 1.5).log_prob(jnp.asarray(xs)),
                 sps.weibull_min(c=1.5, scale=2.0).logpdf(xs), rtol=2e-3,
                 atol=2e-3)
    xs = np.linspace(-3, 5, 9)
    assert_close(dist.Gumbel(0.5, 1.2).log_prob(jnp.asarray(xs)),
                 sps.gumbel_r(0.5, 1.2).logpdf(xs), rtol=2e-3, atol=2e-3)
    xs = np.linspace(1.1, 8.0, 9)
    assert_close(dist.Pareto(1.0, 2.5).log_prob(jnp.asarray(xs)),
                 sps.pareto(b=2.5, scale=1.0).logpdf(xs), rtol=2e-3,
                 atol=2e-3)
    xs = np.linspace(0.5, 10.0, 9)
    assert_close(dist.Chi2(4.0).log_prob(jnp.asarray(xs)),
                 sps.chi2(4.0).logpdf(xs), rtol=2e-3, atol=2e-3)


def test_new_discrete_vs_scipy():
    ks = np.arange(0, 10)
    assert_close(dist.Geometric(probs=0.3).log_prob(jnp.asarray(ks)),
                 sps.geom(0.3, loc=-1).logpmf(ks), rtol=2e-3, atol=2e-3)
    # scipy nbinom: failures before n-th success with success prob p
    assert_close(
        dist.NegativeBinomial(5.0, probs=0.4).log_prob(jnp.asarray(ks)),
        sps.nbinom(5, 0.6).logpmf(ks), rtol=2e-3, atol=2e-3,
    )
    x = np.array([[3, 2, 5], [1, 0, 9], [4, 4, 2]])
    probs = np.array([0.2, 0.3, 0.5])
    assert_close(
        dist.Multinomial(10, probs=jnp.asarray(probs)).log_prob(
            jnp.asarray(x)),
        sps.multinomial(10, probs).logpmf(x), rtol=2e-3, atol=2e-3,
    )


def test_new_families_sampling():
    n = 60_000
    for d in [dist.Weibull(2.0, 1.5), dist.Gumbel(0.5, 1.2),
              dist.Chi2(4.0), dist.Geometric(probs=0.3),
              dist.NegativeBinomial(5.0, probs=0.4)]:
        s = d.sample(jax.random.PRNGKey(11), (n,))
        np.testing.assert_allclose(float(jnp.mean(s)), float(d.mean),
                                   rtol=0.05, atol=0.05)
    m = dist.Multinomial(20, probs=jnp.asarray([0.2, 0.3, 0.5]))
    s = m.sample(jax.random.PRNGKey(12), (20_000,))
    assert np.all(np.asarray(s.sum(-1)) == 20)
    np.testing.assert_allclose(np.asarray(s.astype(jnp.float32).mean(0)),
                               np.asarray(m.mean), rtol=0.03)


def test_ordered_logistic():
    """pmf matches the sigmoid-difference formula; sampling moments; and
    cutpoint recovery via NUTS with the ordered constraint."""
    eta = np.array([-0.5, 0.3])
    cp = np.array([-1.0, 0.5, 2.0])
    d = dist.OrderedLogistic(jnp.asarray(eta), jnp.asarray(cp))
    assert d.num_categories == 4

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    cdf = sig(cp[None, :] - eta[:, None])
    want = np.diff(np.concatenate(
        [np.zeros((2, 1)), cdf, np.ones((2, 1))], 1), axis=1)
    assert_close(jnp.exp(d.log_prob(jnp.arange(4)[:, None])).T,
                 want, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d.probs).sum(-1), 1.0, rtol=1e-6)

    samp = np.asarray(d.sample(jax.random.PRNGKey(0), (20000,)))
    for k in range(4):
        np.testing.assert_allclose((samp == k).mean(0), want[:, k],
                                   atol=0.02)


def test_ordered_logistic_extreme_predictors_stable():
    """ADVICE r3: category log-probs are computed in log space — for an
    extreme predictor the tail category's log-prob is the linear logistic
    tail (c_0 - eta), not a clipped log(1e-30) floor."""
    cp = jnp.asarray([-1.0, 0.5, 2.0])
    d = dist.OrderedLogistic(jnp.asarray(40.0), cp)
    lp0 = float(d.log_prob(jnp.asarray(0)))
    # P(0) = sigmoid(c_0 - eta) ~ exp(-41): log-prob ~ -41, exactly linear
    np.testing.assert_allclose(lp0, -41.0, atol=1e-3)
    assert np.isfinite(np.asarray(d.log_prob(jnp.arange(4)))).all()
    # the whole pmf still normalizes
    np.testing.assert_allclose(np.asarray(d.probs).sum(-1), 1.0, rtol=1e-6)


def test_ordered_logistic_nonascending_cutpoints_surface_nan():
    """Non-ascending cutpoints are an invalid parameterization: the density
    must come out NaN (surfaced), not a silently-wrong clipped value."""
    d = dist.OrderedLogistic(jnp.asarray(0.0), jnp.asarray([1.0, -1.0]))
    lp = np.asarray(d.log_prob(jnp.arange(3)))
    assert np.isnan(lp).any()


def test_ordered_logistic_regression_nuts():
    from bayesic_tpu.core import sample as s_
    from bayesic_tpu.dist import constraints as cns
    from bayesic_tpu.infer.mcmc import MCMC

    rng = np.random.default_rng(0)
    n = 600
    x = rng.normal(0, 1, n).astype(np.float32)
    beta_true = 1.2
    cp_true = np.array([-0.8, 0.9])
    eta = beta_true * x
    cdf = 1.0 / (1.0 + np.exp(-(cp_true[None, :] - eta[:, None])))
    probs = np.diff(np.concatenate(
        [np.zeros((n, 1)), cdf, np.ones((n, 1))], 1), axis=1)
    y = np.array([rng.choice(3, p=p) for p in probs]).astype(np.int32)
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def model():
        beta = s_("beta", dist.Normal(0.0, 2.0))
        cp = s_("cut", dist.TransformedDistribution(
            dist.Normal(jnp.zeros(2), 2.0).to_event(1),
            __import__("bayesic_tpu.dist.transforms", fromlist=["Ordered"])
            .Ordered()))
        s_("obs", dist.OrderedLogistic(beta * xj, cp).to_event(1), obs=yj)

    r = MCMC(model=model, num_warmup=400, num_samples=400,
             num_chains=4).run(jax.random.PRNGKey(1))
    beta_hat = float(jnp.mean(r.samples["beta"]))
    cp_hat = np.asarray(r.samples["cut"]).reshape(-1, 2).mean(0)
    assert abs(beta_hat - beta_true) < 0.25
    np.testing.assert_allclose(cp_hat, cp_true, atol=0.3)
