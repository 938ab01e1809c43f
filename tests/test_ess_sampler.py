"""Elliptical slice sampler tests: conjugate posterior recovery, the
whitened-prior guard, and agreement with NUTS on a non-Gaussian likelihood.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesic_tpu import dist
from bayesic_tpu.core import sample
from bayesic_tpu.infer.mcmc.ess import EllipticalSlice


def test_recovers_conjugate_posterior():
    # whitened normal-mean model: mu = 2*z, z ~ N(0,1); y ~ N(mu, 1)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(1.0, 1.0, 64).astype(np.float32))

    def model():
        z = sample("z", dist.Normal(0.0, 1.0))
        sample("obs", dist.Normal(2.0 * z, 1.0).expand((64,)).to_event(1),
               obs=y)

    # posterior over z: precision 1 + 4*64, mean = 2*sum(y)/prec
    prec = 1.0 + 4.0 * 64
    pm = 2.0 * float(y.sum()) / prec
    ps = 1.0 / np.sqrt(prec)

    s = EllipticalSlice(model, num_samples=1500, num_burnin=300,
                        num_chains=8)
    res = s.run(jax.random.PRNGKey(0))
    z = np.asarray(res.samples["z"]).reshape(-1)
    assert abs(z.mean() - pm) < 4 * ps / np.sqrt(200)  # generous MCSE
    np.testing.assert_allclose(z.std(), ps, rtol=0.1)
    # tuning-free: every kept transition accepted within the iteration cap
    assert int(np.asarray(res.extra["shrink_iters"]).max()) < 30


def test_rejects_non_whitened_prior():
    def model():
        sample("mu", dist.Normal(3.0, 2.0))

    with pytest.raises(ValueError, match="standard-normal"):
        EllipticalSlice(model)


def test_matches_nuts_on_logistic_likelihood():
    from bayesic_tpu.infer.mcmc import MCMC

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(96, 3)).astype(np.float32))
    w_true = np.array([1.0, -1.0, 0.5], np.float32)
    p = 1 / (1 + np.exp(-np.asarray(x) @ w_true))
    y = jnp.asarray((rng.uniform(size=96) < p).astype(np.float32))

    def model():
        w = sample("w", dist.Normal(0.0, 1.0).expand((3,)).to_event(1))
        sample("obs", dist.Bernoulli(logits=x @ w).to_event(1), obs=y)

    es = EllipticalSlice(model, num_samples=2000, num_burnin=500,
                         num_chains=8).run(jax.random.PRNGKey(2))
    nu = MCMC(model=model, num_warmup=500, num_samples=500,
              num_chains=8).run(jax.random.PRNGKey(3))
    w_es = np.asarray(es.samples["w"]).reshape(-1, 3)
    w_nu = np.asarray(nu.samples["w"]).reshape(-1, 3)
    np.testing.assert_allclose(w_es.mean(0), w_nu.mean(0), atol=0.12)
    np.testing.assert_allclose(w_es.std(0), w_nu.std(0), atol=0.08)
