"""SGMCMC (SGLD / pSGLD / SGHMC) correctness tests.

Blueprint: SURVEY.md C8 periphery — minibatch-gradient samplers. The
oracle is the conjugate normal-mean posterior (same analytic target the
linreg/NUTS tests use): with x_i ~ N(mu, sigma^2), mu ~ N(0, tau^2), the
posterior over mu is Gaussian with known mean/variance, so a small-step
SGLD chain must recover both within MC error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bayesic_tpu as bst
from bayesic_tpu import dist
from bayesic_tpu.infer.sgmcmc import SGMCMC


SIGMA, TAU, N = 1.0, 2.0, 256


def _make(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(0.7, SIGMA, size=N).astype(np.float32)
    post_var = 1.0 / (1.0 / TAU**2 + N / SIGMA**2)
    post_mean = post_var * x.sum() / SIGMA**2
    return jnp.asarray(x), float(post_mean), float(post_var)


def _model(x):
    mu = bst.sample("mu", dist.Normal(0.0, TAU))
    with bst.plate("data", x.shape[0], subsample_size=64) as idx:
        bst.sample("obs", dist.Normal(mu, SIGMA), obs=x[idx])


@pytest.mark.parametrize("method", ["sgld", "psgld", "sghmc"])
def test_recovers_conjugate_posterior(method):
    x, post_mean, post_var = _make()
    # psgld's RMSProp preconditioner makes the effective step ~eps itself
    # (grad/|grad| drift), so it wants a step ~100x the raw-SGLD one
    step = {"sgld": 2e-4, "psgld": 1e-2, "sghmc": 5e-5}[method]
    s = SGMCMC(_model, method=method, step_size=step, num_chains=8,
               num_burnin=2000, num_samples=1500, model_args=(x,))
    res = s.run(jax.random.PRNGKey(0))
    draws = np.asarray(res.samples["mu"]).reshape(-1)
    assert np.isfinite(draws).all()
    # minibatch-noise bias inflates variance slightly; loose but real bounds
    assert abs(draws.mean() - post_mean) < 6 * np.sqrt(post_var)
    assert draws.std() < 6 * np.sqrt(post_var)
    assert draws.std() > 0.3 * np.sqrt(post_var)


def test_step_decay_schedule():
    x, _, _ = _make()
    s = SGMCMC(_model, method="sgld", step_decay=(1e-2, 10.0, 0.55),
               num_chains=2, num_burnin=50, num_samples=50,
               model_args=(x,))
    res = s.run(jax.random.PRNGKey(1))
    total = 50 + 50
    expect = 1e-2 / (10.0 + total) ** 0.55
    assert np.isclose(float(res.extra["final_step_size"]), expect, rtol=1e-5)
    assert np.isfinite(np.asarray(res.unconstrained)).all()


def test_thinning_and_shapes():
    x, _, _ = _make()
    s = SGMCMC(_model, method="sgld", step_size=1e-4, num_chains=3,
               num_burnin=20, num_samples=40, thin=5, model_args=(x,))
    res = s.run(jax.random.PRNGKey(2))
    assert res.samples["mu"].shape == (3, 40)
    assert res.unconstrained.shape == (3, 40, 1)
    assert res.extra["grad_norm"].shape == (3, 40)


def test_full_batch_model_no_subsample():
    # models without a subsampled plate run full-batch gradients
    x, post_mean, post_var = _make()

    def model():
        mu = bst.sample("mu", dist.Normal(0.0, TAU))
        bst.sample("obs", dist.Normal(mu, SIGMA), obs=x)

    s = SGMCMC(model, method="sgld", step_size=2e-4, num_chains=4,
               num_burnin=500, num_samples=1000)
    draws = np.asarray(s.run(jax.random.PRNGKey(3)).samples["mu"]).reshape(-1)
    assert abs(draws.mean() - post_mean) < 6 * np.sqrt(post_var)
