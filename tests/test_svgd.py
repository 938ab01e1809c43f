"""SVGD correctness: conjugate-posterior recovery, correlation capture,
and subsampled-plate support."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import bayesic_tpu as bst
from bayesic_tpu import dist
from bayesic_tpu.core import sample
from bayesic_tpu.infer.svgd import SVGD


def test_recovers_conjugate_normal_posterior():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(1.2, 1.0, 128).astype(np.float32))
    post_var = 1.0 / (1.0 / 4.0 + 128.0)
    post_mean = post_var * float(y.sum())

    def model():
        mu = sample("mu", dist.Normal(0.0, 2.0))
        sample("obs", dist.Normal(mu, 1.0).expand((128,)).to_event(1),
               obs=y)

    s = SVGD(model, num_particles=128, num_steps=1500,
             optimizer=optax.adam(5e-2))
    res = s.run(jax.random.PRNGKey(0))
    mu = np.asarray(res.samples["mu"])
    assert abs(mu.mean() - post_mean) < 3 * np.sqrt(post_var)
    # particles spread to the posterior std, not collapsed to the MAP
    assert 0.5 * np.sqrt(post_var) < mu.std() < 2.0 * np.sqrt(post_var)


def test_captures_correlation():
    # strongly correlated 2D Gaussian target
    cov = np.array([[1.0, 0.95], [0.95, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)

    def model():
        w = sample("w", dist.Normal(0.0, 10.0).expand((2,)).to_event(1))
        bst.factor("target",
                   -0.5 * w @ prec @ w
                   - dist.Normal(0.0, 10.0).log_prob(w).sum())

    s = SVGD(model, num_particles=256, num_steps=2000,
             optimizer=optax.adam(5e-2))
    res = s.run(jax.random.PRNGKey(1))
    w = np.asarray(res.samples["w"])
    cc = np.corrcoef(w.T)
    assert abs(cc[0, 1] - 0.95) < 0.1
    assert abs(w.std(0).mean() - 1.0) < 0.35


def test_subsampled_plate():
    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.normal(-0.5, 1.0, 256).astype(np.float32))

    def model():
        mu = sample("mu", dist.Normal(0.0, 2.0))
        with bst.plate("data", 256, subsample_size=64) as idx:
            sample("obs", dist.Normal(mu, 1.0), obs=y[idx])

    s = SVGD(model, num_particles=64, num_steps=1200,
             optimizer=optax.adam(3e-2))
    res = s.run(jax.random.PRNGKey(2))
    mu = np.asarray(res.samples["mu"])
    assert abs(mu.mean() - float(y.mean())) < 0.1
    assert np.isfinite(np.asarray(res.extra["phi_norm"])).all()
