"""Compound / circular / random-walk families vs scipy golden values and
analytic moments (SURVEY.md §4.1 pattern, extended to the round-2 families).
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as ss

from bayesic_tpu import dist

KEY = jax.random.PRNGKey(0)


def test_beta_binomial_scipy_golden():
    d = dist.BetaBinomial(2.5, 1.5, 10)
    ks = jnp.arange(11)
    ref = ss.betabinom(10, 2.5, 1.5).logpmf(np.arange(11))
    np.testing.assert_allclose(np.asarray(d.log_prob(ks)), ref, rtol=1e-5)
    x = d.sample(KEY, (20000,))
    assert abs(float(x.mean()) - float(d.mean)) < 0.08
    assert abs(float(jnp.var(x.astype(jnp.float32)))
               - float(d.variance)) < 0.25


def test_dirichlet_multinomial_scipy_golden():
    alpha = np.array([1.2, 3.4, 0.7])
    d = dist.DirichletMultinomial(jnp.asarray(alpha), 8)
    x = np.array([[3, 4, 1], [0, 8, 0], [2, 2, 4]])
    ref = ss.dirichlet_multinomial(alpha, 8).logpmf(x)
    np.testing.assert_allclose(
        np.asarray(d.log_prob(jnp.asarray(x))), ref, rtol=1e-5)
    draws = d.sample(KEY, (8000,))
    assert draws.shape == (8000, 3)
    assert np.all(np.asarray(draws).sum(-1) == 8)
    np.testing.assert_allclose(np.asarray(draws, np.float64).mean(0),
                               np.asarray(d.mean), atol=0.12)


def test_von_mises_scipy_golden():
    d = dist.VonMises(0.5, 2.0)
    xs = jnp.linspace(-3.0, 3.0, 9)
    ref = ss.vonmises(2.0, loc=0.5).logpdf(np.asarray(xs))
    np.testing.assert_allclose(np.asarray(d.log_prob(xs)), ref, rtol=1e-5)


def test_von_mises_sampler():
    for kappa in (0.5, 4.0, 50.0):
        d = dist.VonMises(1.0, kappa)
        x = np.asarray(d.sample(jax.random.PRNGKey(int(kappa)), (40000,)))
        assert (x > -np.pi).all() and (x <= np.pi).all()
        # circular mean and resultant length vs analytic
        c = np.exp(1j * x).mean()
        assert abs(np.angle(c) - 1.0) < 0.03
        r_ref = ss.vonmises(kappa).expect(lambda t: np.cos(t))
        assert abs(np.abs(c) - r_ref) < 0.02


def test_von_mises_as_latent_site():
    from bayesic_tpu.core import sample
    from bayesic_tpu.infer.mcmc import MCMC

    data = np.asarray(
        dist.VonMises(0.8, 5.0).sample(jax.random.PRNGKey(2), (200,)))

    def model():
        mu = sample("mu", dist.VonMises(0.0, 0.1))
        sample("obs", dist.VonMises(mu, 5.0).expand((200,)).to_event(1),
               obs=jnp.asarray(data))

    r = MCMC(model=model, num_warmup=300, num_samples=300,
             num_chains=2).run(jax.random.PRNGKey(3))
    mu = np.asarray(r.samples["mu"]).reshape(-1)
    assert abs(np.angle(np.exp(1j * mu).mean()) - 0.8) < 0.1


def test_gaussian_random_walk():
    d = dist.GaussianRandomWalk(0.7, 20)
    x = d.sample(KEY, (5000,))
    assert x.shape == (5000, 20)
    # marginal variance grows linearly
    np.testing.assert_allclose(np.asarray(x).var(0), np.asarray(d.variance),
                               rtol=0.15)
    # density = product of increment normals
    one = x[0]
    diffs = np.diff(np.asarray(one), prepend=0.0)
    ref = ss.norm(0, 0.7).logpdf(diffs).sum()
    np.testing.assert_allclose(float(d.log_prob(one)), ref, rtol=1e-5)


def test_zero_inflated_poisson():
    d = dist.ZeroInflatedPoisson(0.3, 2.5)
    ks = np.arange(12)
    base = ss.poisson(2.5).pmf(ks)
    ref = np.log(0.7 * base + np.where(ks == 0, 0.3, 0.0))
    np.testing.assert_allclose(
        np.asarray(d.log_prob(jnp.asarray(ks))), ref, rtol=1e-5)
    x = np.asarray(d.sample(KEY, (30000,)))
    assert abs(x.mean() - 0.7 * 2.5) < 0.05
    assert abs((x == 0).mean() - (0.3 + 0.7 * np.exp(-2.5))) < 0.01
    np.testing.assert_allclose(x.var(), float(d.variance), rtol=0.05)


def test_zero_inflated_negative_binomial():
    d = dist.ZeroInflatedNegativeBinomial(0.2, 3.0, probs=0.4)
    ks = np.arange(15)
    base = ss.nbinom(3.0, 0.6).pmf(ks)   # scipy p = success prob = 1-probs
    ref = np.log(0.8 * base + np.where(ks == 0, 0.2, 0.0))
    np.testing.assert_allclose(
        np.asarray(d.log_prob(jnp.asarray(ks))), ref, rtol=1e-4)


def test_censored_log_prob():
    base = dist.Normal(1.0, 2.0)
    d = dist.Censored(base, lower=-1.0, upper=3.0)
    # interior: base density
    np.testing.assert_allclose(float(d.log_prob(jnp.asarray(0.5))),
                               ss.norm(1, 2).logpdf(0.5), rtol=1e-6)
    # at bounds: tail masses
    np.testing.assert_allclose(float(d.log_prob(jnp.asarray(-1.0))),
                               np.log(ss.norm(1, 2).cdf(-1.0)), rtol=1e-5)
    np.testing.assert_allclose(float(d.log_prob(jnp.asarray(3.0))),
                               np.log(ss.norm(1, 2).sf(3.0)), rtol=1e-5)
    # sampling clips; masses at the bounds match the tails
    x = np.asarray(d.sample(KEY, (40000,)))
    assert x.min() >= -1.0 and x.max() <= 3.0
    assert abs((x == -1.0).mean() - ss.norm(1, 2).cdf(-1.0)) < 0.01
    assert abs((x == 3.0).mean() - ss.norm(1, 2).sf(3.0)) < 0.01


def test_censored_tobit_regression():
    """Tobit model: y* = a + b x + eps, observed y = max(y*, 0); NUTS must
    recover (a, b) despite 40% censoring."""
    from bayesic_tpu.core import sample
    from bayesic_tpu.infer.mcmc import MCMC

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-2, 2, 300).astype(np.float32))
    a_true, b_true = -0.5, 1.2
    y_star = a_true + b_true * np.asarray(x) + rng.normal(0, 0.5, 300)
    y = jnp.asarray(np.maximum(y_star, 0.0).astype(np.float32))
    assert 0.25 < float((y == 0).mean()) < 0.65

    def model():
        a = sample("a", dist.Normal(0.0, 2.0))
        b = sample("b", dist.Normal(0.0, 2.0))
        base = dist.Normal(a + b * x, 0.5)
        sample("obs", dist.Censored(base, lower=0.0).to_event(1), obs=y)

    r = MCMC(model=model, num_warmup=400, num_samples=400,
             num_chains=4).run(jax.random.PRNGKey(4))
    a_hat = float(np.asarray(r.samples["a"]).mean())
    b_hat = float(np.asarray(r.samples["b"]).mean())

    # oracle: the Tobit MLE on the same data (posterior mean must sit on
    # it; the flat-ish priors contribute negligible shrinkage at n=300)
    from scipy.optimize import minimize

    def nll(p):
        mu = p[0] + p[1] * np.asarray(x)
        ll = np.where(np.asarray(y) == 0,
                      ss.norm.logcdf((0 - mu) / 0.5),
                      ss.norm.logpdf(np.asarray(y), mu, 0.5))
        return -ll.sum()

    a_mle, b_mle = minimize(nll, [0.0, 0.0]).x
    assert abs(a_hat - a_mle) < 0.05
    assert abs(b_hat - b_mle) < 0.05
    # and the truth is inside 3 posterior sds
    assert abs(a_hat - a_true) < 3 * np.asarray(r.samples["a"]).std() + 0.05
    assert abs(b_hat - b_true) < 3 * np.asarray(r.samples["b"]).std() + 0.05


def test_cdf_icdf_roundtrip():
    cases = [dist.Normal(0.5, 2.0), dist.Exponential(1.5),
             dist.Gumbel(0.0, 1.0), dist.Cauchy(1.0, 0.5),
             dist.Uniform(-1.0, 2.0), dist.Weibull(2.0, 1.5),
             dist.LogNormal(0.2, 0.7)]
    q = jnp.asarray([0.05, 0.3, 0.5, 0.9])
    for d in cases:
        np.testing.assert_allclose(np.asarray(d.cdf(d.icdf(q))),
                                   np.asarray(q), rtol=1e-5, atol=1e-6)


def test_truncated_generic():
    import scipy.integrate as si
    d = dist.Truncated(dist.Gamma(2.0, 1.0), lower=1.0, upper=4.0)
    z = ss.gamma(2).cdf(4) - ss.gamma(2).cdf(1)

    def pdf(t):
        return ss.gamma(2).pdf(t) / z

    np.testing.assert_allclose(float(d.log_prob(jnp.asarray(2.0))),
                               np.log(pdf(2.0)), rtol=1e-5)
    assert float(d.log_prob(jnp.asarray(0.5))) == -np.inf
    x = np.asarray(d.sample(KEY, (40000,)))
    assert x.min() >= 1.0 and x.max() <= 4.0
    m_ref = si.quad(lambda t: t * pdf(t), 1, 4)[0]
    assert abs(x.mean() - m_ref) < 0.02


def test_truncated_icdf_path():
    # Exponential has icdf -> exact inverse-cdf sampling
    d = dist.Truncated(dist.Exponential(2.0), upper=1.0)
    x = np.asarray(d.sample(KEY, (40000,)))
    assert x.max() <= 1.0
    z = 1 - np.exp(-2.0)
    import scipy.integrate as si
    m_ref = si.quad(lambda t: t * 2 * np.exp(-2 * t) / z, 0, 1)[0]
    assert abs(x.mean() - m_ref) < 0.01


def test_truncated_as_latent_site():
    from bayesic_tpu.core import sample
    from bayesic_tpu.infer.mcmc import MCMC

    rng = np.random.default_rng(5)
    y = jnp.asarray(rng.normal(2.2, 1.0, 100).astype(np.float32))

    def model():
        # prior truncated to [0, 3]: posterior must respect the bound
        mu = sample("mu", dist.Truncated(dist.Normal(0.0, 5.0),
                                         lower=0.0, upper=3.0))
        sample("obs", dist.Normal(mu, 1.0).expand((100,)).to_event(1),
               obs=y)

    r = MCMC(model=model, num_warmup=300, num_samples=300,
             num_chains=4).run(jax.random.PRNGKey(6))
    mu = np.asarray(r.samples["mu"]).reshape(-1)
    assert mu.min() >= 0.0 and mu.max() <= 3.0
    assert abs(mu.mean() - float(y.mean())) < 0.25


def test_von_mises_small_kappa():
    """Regression (r2 review): kappa <= ~1e-4 used to collapse to a point
    mass at loc via f32 cancellation in the rejection constants."""
    for kappa in (0.0, 1e-5, 1e-4, 1e-2):
        x = np.asarray(dist.VonMises(0.5, kappa).sample(
            jax.random.PRNGKey(7), (20000,)))
        # near-uniform on the circle: large spread, tiny resultant
        assert x.std() > 1.5
        assert np.abs(np.exp(1j * x).mean()) < 0.05 + kappa


def test_dirichlet_multinomial_batched_and_jitted_sampling():
    """Regression (r2 review): batched/traced total_count used to crash in
    sample via int(total_count)."""
    alpha = jnp.ones((2, 3))
    n = jnp.asarray([10, 20])
    d = dist.DirichletMultinomial(alpha, n)
    x = jax.jit(lambda k: d.sample(k, (500,)))(KEY)
    assert x.shape == (500, 2, 3)
    np.testing.assert_array_equal(np.asarray(x).sum(-1),
                                  np.broadcast_to([10, 20], (500, 2)))
    np.testing.assert_allclose(np.asarray(x[:, 1]).mean(0),
                               20 / 3, atol=0.5)


def test_truncated_normal_support_and_tails():
    d = dist.TruncatedNormal(0.0, 1.0, low=0.0, high=1.0)
    assert float(d.log_prob(jnp.asarray(-5.0))) == -np.inf
    assert float(d.log_prob(jnp.asarray(2.0))) == -np.inf
    # far-tail truncation window stays finite (used to hit log(0))
    far = dist.TruncatedNormal(0.0, 1.0, low=9.0, high=10.0)
    lp = float(far.log_prob(jnp.asarray(9.1)))
    assert np.isfinite(lp)
    ref = (ss.norm.logpdf(9.1)
           - np.log(ss.norm.sf(9.0) - ss.norm.sf(10.0)))
    np.testing.assert_allclose(lp, ref, rtol=1e-3)


def test_wrapper_distributions_expand():
    """Regression: expand on wrapper distributions with Distribution-
    valued params used to crash in broadcast_to; they now expand their
    base recursively (None bounds skipped)."""
    c = dist.Censored(dist.Normal(0.0, 1.0), lower=0.0).expand((5,))
    assert c.batch_shape == (5,)
    assert c.sample(KEY).shape == (5,)
    t = dist.Truncated(dist.Normal(0.0, 2.0), lower=-1.0).expand((4,))
    assert t.log_prob(jnp.zeros(4)).shape == (4,)
    z = dist.ZeroInflatedPoisson(0.2, 3.0).expand((7,))
    assert z.log_prob(jnp.zeros(7, jnp.int32)).shape == (7,)
