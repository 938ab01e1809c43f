"""Posterior predictive + custom DSL guide tests (API parity features)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import bayesic_tpu.dist as dist
from bayesic_tpu.core import param, sample
from bayesic_tpu.dist import constraints
from bayesic_tpu.infer.predictive import Predictive
from bayesic_tpu.infer.svi import SVI, MeanFieldGuide, TraceGuide

KEY = jax.random.PRNGKey(0)


def test_prior_predictive():
    def model():
        mu = sample("mu", dist.Normal(0.0, 1.0))
        sample("obs", dist.Normal(mu, 0.5).expand((10,)).to_event(1),
               obs=jnp.zeros(10))

    pred = Predictive(model, num_samples=2000)
    out = pred(KEY)
    assert out["mu"].shape == (2000,)
    assert out["obs"].shape == (2000, 10)
    # marginal var of obs = 1 + 0.25
    assert abs(float(out["obs"].var()) - 1.25) < 0.1


def test_posterior_predictive_conditions_on_samples():
    def model():
        mu = sample("mu", dist.Normal(0.0, 10.0))
        sample("obs", dist.Normal(mu, 0.1).expand((5,)).to_event(1),
               obs=jnp.zeros(5))

    mu_post = jnp.full((300,), 3.0)
    pred = Predictive(model, posterior_samples={"mu": mu_post})
    out = pred(KEY)
    assert "mu" not in out           # provided, not resampled
    np.testing.assert_allclose(float(out["obs"].mean()), 3.0, atol=0.05)


def test_trace_guide_matches_meanfield():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(2.0, 1.0, 40).astype(np.float32))

    def model():
        mu = sample("mu", dist.Normal(0.0, 10.0))
        sample("obs", dist.Normal(mu, 1.0).expand((40,)).to_event(1), obs=y)

    def guide():
        loc = param("mu_loc", jnp.zeros(()))
        scale = param("mu_scale", jnp.asarray(0.1),
                      constraint=constraints.positive)
        sample("mu", dist.Normal(loc, scale))

    svi = SVI(model, lambda info: TraceGuide(guide, info),
              optax.adam(0.05))
    res = svi.run(KEY, 1500)

    n = 40
    post_var = 1.0 / (1.0 / 100.0 + n)
    post_mean = post_var * float(y.sum())
    loc = float(res.params["mu_loc"])
    scale = float(jnp.exp(res.params["mu_scale"]))  # positive via Exp
    assert abs(loc - post_mean) < 0.05
    np.testing.assert_allclose(scale, np.sqrt(post_var), rtol=0.2)


def test_trace_guide_constrained_latent():
    """Guide over a positive latent must handle the Jacobian correction."""
    rng = np.random.default_rng(1)
    n = 150
    y = jnp.asarray(rng.normal(0.0, 2.0, n).astype(np.float32))

    def model():
        s = sample("s", dist.HalfNormal(5.0))
        sample("obs", dist.Normal(0.0, s).expand((n,)).to_event(1), obs=y)

    def guide():
        loc = param("s_loc", jnp.asarray(0.5))
        scale = param("s_scale", jnp.asarray(0.1),
                      constraint=constraints.positive)
        sample("s", dist.LogNormal(loc, scale))

    svi = SVI(model, lambda info: TraceGuide(guide, info),
              optax.adam(0.02))
    res = svi.run(KEY, 2500)
    s_mean = float(jnp.exp(res.params["s_loc"]))   # LogNormal median
    assert abs(s_mean - 2.0) < 0.25


def test_trace_guide_missing_latent_rejected():
    def model():
        sample("a", dist.Normal(0.0, 1.0))
        sample("b", dist.Normal(0.0, 1.0))

    def guide():
        sample("a", dist.Normal(param("loc", jnp.zeros(())), 1.0))

    try:
        SVI(model, lambda info: TraceGuide(guide, info), optax.adam(0.1))
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "b" in str(e)
