"""Property tests (SURVEY.md §4.9): transforms stay in support; log_prob
finite near support boundaries; resampler mass preservation; determinism
snapshots (§4.8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bayesic_tpu.dist as dist
from bayesic_tpu.dist import constraints, transforms as tf
from bayesic_tpu.parallel.resample import systematic_ancestors

try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

pytestmark = pytest.mark.skipif(not HAVE_HYPOTHESIS,
                                reason="hypothesis not installed")

finite_floats = st.floats(-20.0, 20.0, allow_nan=False,
                          allow_infinity=False)


@settings(max_examples=50, deadline=None)
@given(st.lists(finite_floats, min_size=2, max_size=6))
def test_stickbreaking_always_simplex(us):
    u = jnp.asarray(us, jnp.float32)
    x = tf.StickBreaking().forward(u)
    assert bool(constraints.simplex(x)), x


@settings(max_examples=50, deadline=None)
@given(st.lists(st.floats(-5.0, 5.0, allow_nan=False), min_size=3,
                max_size=10))
def test_ordered_always_ordered(us):
    x = tf.Ordered().forward(jnp.asarray(us, jnp.float32))
    assert bool(constraints.ordered(x))


@settings(max_examples=30, deadline=None)
@given(st.integers(2, 5), st.integers(0, 1000))
def test_corr_cholesky_always_valid(m, seed):
    n = m * (m - 1) // 2
    u = jax.random.normal(jax.random.PRNGKey(seed), (n,)) * 2.0
    ls = tf.CorrCholesky().forward(u)
    assert bool(constraints.corr_cholesky(ls))


@settings(max_examples=40, deadline=None)
@given(st.floats(0.05, 10.0), st.floats(0.05, 10.0))
def test_gamma_logprob_finite_on_support(conc, rate):
    d = dist.Gamma(conc, rate)
    xs = jnp.asarray([1e-6, 1e-3, 0.1, 1.0, 10.0, 100.0])
    lp = d.log_prob(xs)
    assert bool(jnp.all(jnp.isfinite(lp)))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(-10.0, 10.0, allow_nan=False), min_size=4,
                max_size=32), st.integers(0, 10_000))
def test_resampler_counts_bounded_by_systematic_guarantee(lws, seed):
    """Systematic resampling: offspring count of particle i is either
    floor(N w_i) or ceil(N w_i) — the low-variance guarantee."""
    lw = jnp.asarray(lws, jnp.float32)
    n = lw.shape[0]
    anc = np.asarray(systematic_ancestors(jax.random.PRNGKey(seed), lw))
    counts = np.bincount(anc, minlength=n)
    w = np.exp(np.asarray(lw) - np.max(np.asarray(lw)))
    w = w / w.sum()
    expected = n * w
    assert np.all(counts >= np.floor(expected) - 1e-6)
    assert np.all(counts <= np.ceil(expected) + 1e-6)


def test_seeded_runs_are_deterministic():
    """§4.8: fixed-seed end-to-end runs reproduce exactly."""
    import optax

    from bayesic_tpu.core import sample
    from bayesic_tpu.infer.svi import SVI, MeanFieldGuide

    y = jnp.asarray(np.random.default_rng(0).normal(0, 1, 20)
                    .astype(np.float32))

    def model():
        mu = sample("mu", dist.Normal(0.0, 5.0))
        sample("obs", dist.Normal(mu, 1.0).expand((20,)).to_event(1), obs=y)

    def run_once():
        svi = SVI(model, MeanFieldGuide, optax.adam(0.05))
        return np.asarray(svi.run(jax.random.PRNGKey(7), 100).losses)

    np.testing.assert_array_equal(run_once(), run_once())


def test_nuts_deterministic():
    from bayesic_tpu.core import sample
    from bayesic_tpu.infer.mcmc import MCMC

    def model():
        sample("x", dist.Normal(0.0, 1.0).expand((2,)).to_event(1))

    def run_once():
        m = MCMC(model=model, num_warmup=50, num_samples=50, num_chains=2,
                 init_step_size=0.5)
        return np.asarray(m.run(jax.random.PRNGKey(3)).unconstrained)

    np.testing.assert_array_equal(run_once(), run_once())


def test_cdf_properties_all_families():
    """cdf in [0,1], monotone on a support grid, consistent with empirical
    sampling, and icdf(cdf(x)) == x where icdf exists."""
    cases = [
        (dist.Normal(0.3, 1.7), np.linspace(-5, 5, 41)),
        (dist.LogNormal(0.1, 0.6), np.linspace(0.05, 8, 41)),
        (dist.HalfNormal(2.0), np.linspace(0.01, 6, 41)),
        (dist.Cauchy(0.0, 1.0), np.linspace(-8, 8, 41)),
        (dist.HalfCauchy(1.5), np.linspace(0.01, 10, 41)),
        (dist.Laplace(-0.5, 1.2), np.linspace(-6, 5, 41)),
        (dist.Exponential(0.7), np.linspace(0.01, 8, 41)),
        (dist.Gamma(2.0, 1.5), np.linspace(0.01, 6, 41)),
        (dist.Beta(2.0, 3.0), np.linspace(0.01, 0.99, 41)),
        (dist.Uniform(-1.0, 2.0), np.linspace(-1, 2, 41)),
        (dist.Weibull(1.5, 2.0), np.linspace(0.01, 5, 41)),
        (dist.Gumbel(0.0, 1.0), np.linspace(-4, 6, 41)),
        (dist.Pareto(1.0, 2.5), np.linspace(1.01, 8, 41)),
        (dist.StudentT(4.0, 0.0, 1.0), np.linspace(-6, 6, 41)),
    ]
    key = jax.random.PRNGKey(0)
    for d, grid in cases:
        c = np.asarray(d.cdf(jnp.asarray(grid, jnp.float32)))
        assert np.all((c >= 0) & (c <= 1)), type(d).__name__
        assert np.all(np.diff(c) >= -1e-6), type(d).__name__
        # empirical CDF agreement at the median-ish grid point
        xs = np.asarray(d.sample(key, (20000,)))
        mid = grid[len(grid) // 2]
        emp = (xs <= mid).mean()
        assert abs(emp - c[len(grid) // 2]) < 0.02, type(d).__name__
        if hasattr(d, "icdf"):
            q = jnp.asarray([0.1, 0.5, 0.9])
            np.testing.assert_allclose(
                np.asarray(d.cdf(d.icdf(q))), np.asarray(q),
                rtol=1e-4, atol=1e-5, err_msg=type(d).__name__)
