"""DiscreteGibbs (NUTS-within-Gibbs) correctness (SURVEY.md C8 extension):
the alternation must target the same joint as marginal (enumerated) NUTS,
and scalar-site conditionals must match analytic posteriors."""

import jax
import jax.numpy as jnp
import numpy as np

import bayesic_tpu.dist as dist
from bayesic_tpu.core import plate, sample
from bayesic_tpu.infer.mcmc import MCMC, DiscreteGibbs


def test_scalar_site_matches_analytic():
    """z ~ Bernoulli(0.3); mu ~ N(0,1); y ~ N(mu + 2 z, 1) with one
    observation: integrating mu out gives p(z=1 | y) in closed form."""
    y = 1.3

    def model():
        z = sample("z", dist.Bernoulli(0.3), infer={"enumerate": True})
        mu = sample("mu", dist.Normal(0.0, 1.0))
        sample("obs", dist.Normal(mu + 2.0 * z, 1.0), obs=jnp.asarray(y))

    # marginal likelihoods: y | z ~ N(2z, sqrt(2))
    from scipy.stats import norm
    l1 = 0.3 * norm(2.0, np.sqrt(2.0)).pdf(y)
    l0 = 0.7 * norm(0.0, np.sqrt(2.0)).pdf(y)
    want_pz1 = l1 / (l0 + l1)

    g = DiscreteGibbs(model, num_warmup=400, num_samples=800, num_chains=8)
    res = g.run(jax.random.PRNGKey(0))
    got_pz1 = float(jnp.mean(res.samples["z"]))
    assert abs(got_pz1 - want_pz1) < 0.03, (got_pz1, want_pz1)

    # continuous conditional: mu | y, z=j ~ N((y-2j)/2, 1/sqrt(2));
    # mixture mean over the posterior of z
    want_mu = want_pz1 * (y - 2.0) / 2.0 + (1 - want_pz1) * y / 2.0
    got_mu = float(jnp.mean(res.samples["mu"]))
    assert abs(got_mu - want_mu) < 0.05, (got_mu, want_mu)


def test_plate_local_site_matches_marginal_nuts():
    """Two-component 1-D location mixture with per-datapoint enumerated
    assignments: DiscreteGibbs and marginal NUTS must agree on the
    posterior of the component means (well-separated data keeps labels
    identified)."""
    rng = np.random.default_rng(0)
    n = 80
    y = np.concatenate([
        rng.normal(-2.0, 0.5, n // 2), rng.normal(2.0, 0.5, n - n // 2)
    ]).astype(np.float32)
    yj = jnp.asarray(y)

    def model():
        mu = sample("mu", dist.Normal(jnp.asarray([-1.0, 1.0]),
                                      2.0).to_event(1))
        with plate("data", n):
            z = sample("z", dist.Categorical(jnp.asarray([0.5, 0.5])),
                       sample_shape=(n,), infer={"enumerate": True})
            sample("obs", dist.Normal(mu[z], 0.5), obs=yj)

    g = DiscreteGibbs(model, num_warmup=400, num_samples=600, num_chains=4)
    gres = g.run(jax.random.PRNGKey(1))

    m = MCMC(model=model, num_warmup=400, num_samples=600, num_chains=4)
    mres = m.run(jax.random.PRNGKey(2))

    # label-invariant comparison: the two-component labeling is symmetric,
    # so each chain may land on either permutation — sort each draw
    g_mu = np.sort(np.asarray(gres.samples["mu"]).reshape(-1, 2), -1)
    m_mu = np.sort(np.asarray(mres.samples["mu"]).reshape(-1, 2), -1)
    np.testing.assert_allclose(g_mu.mean(0), [-2.0, 2.0], atol=0.2)
    np.testing.assert_allclose(g_mu.mean(0), m_mu.mean(0), atol=0.1)
    np.testing.assert_allclose(g_mu.std(0), m_mu.std(0), rtol=0.5)

    # assignments recovered per chain (up to the chain's labeling): the two
    # data halves get opposite, near-deterministic components
    z = np.asarray(gres.samples["z"])  # (chains, samples, n)
    first = z[..., : n // 2].mean((1, 2))
    second = z[..., n // 2:].mean((1, 2))
    np.testing.assert_allclose(np.abs(first - second), 1.0, atol=0.05)

    # diagnostics present and sane
    assert float(jnp.mean(gres.extra["accept_prob"])) > 0.5
    assert not bool(jnp.any(gres.extra["diverging"]))


def test_gibbs_requires_enum_sites():
    def model():
        sample("mu", dist.Normal(0.0, 1.0), obs=None)

    try:
        DiscreteGibbs(model)
    except ValueError as e:
        assert "enumerate" in str(e)
    else:
        raise AssertionError("expected ValueError for enum-free model")
