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
