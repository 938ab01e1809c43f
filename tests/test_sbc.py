"""Simulation-based calibration harness tests: a correct sampler passes
uniformity; a deliberately biased one is caught."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesic_tpu import dist
from bayesic_tpu.utils.sbc import sbc


def _prior_fn(key):
    k1, k2 = jax.random.split(key)
    mu = jax.random.normal(k1) * 2.0
    y = mu + jax.random.normal(k2, (16,))
    return {"mu": mu}, y


def _exact_posterior_draws(key, y, n=99, inflate=1.0, shift=0.0):
    # conjugate posterior for mu ~ N(0, 2^2), y_i ~ N(mu, 1)
    post_var = 1.0 / (0.25 + 16.0)
    post_mean = post_var * jnp.sum(y)
    return {"mu": post_mean + shift
            + jnp.sqrt(post_var) * inflate
            * jax.random.normal(key, (n,))}


def test_exact_sampler_is_calibrated():
    res = sbc(_prior_fn,
              lambda k, y: _exact_posterior_draws(k, y),
              num_sims=200, num_bins=10, key=jax.random.PRNGKey(0))
    assert res.ranks["mu"].shape == (200,)
    assert res.min_pvalue() > 0.01


def test_biased_sampler_is_caught():
    res_shift = sbc(_prior_fn,
                    lambda k, y: _exact_posterior_draws(k, y, shift=0.3),
                    num_sims=200, num_bins=10, key=jax.random.PRNGKey(1))
    assert res_shift.min_pvalue() < 1e-3

    res_narrow = sbc(_prior_fn,
                     lambda k, y: _exact_posterior_draws(k, y, inflate=0.4),
                     num_sims=200, num_bins=10, key=jax.random.PRNGKey(2))
    assert res_narrow.min_pvalue() < 1e-3
