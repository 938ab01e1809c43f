"""Chain-sharding equality for the round-2 backends (SURVEY.md C13a rule:
sharded == unsharded, PRNG keyed by logical index, never by device)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import bayesic_tpu as bst
from bayesic_tpu import dist
from bayesic_tpu.core import sample
from bayesic_tpu.parallel import make_mesh

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


def _chain_sharding():
    return NamedSharding(make_mesh({"chain": 8}), P("chain"))


def _model():
    y = jnp.asarray([1.2, 0.3, -0.5, 2.0])
    mu = sample("mu", dist.Normal(0.0, 2.0))
    sample("obs", dist.Normal(mu, 1.0).expand((4,)).to_event(1), obs=y)


def test_sgmcmc_sharded_matches_unsharded():
    from bayesic_tpu.infer.sgmcmc import SGMCMC

    kw = dict(method="sgld", step_size=1e-3, num_chains=8,
              num_burnin=50, num_samples=50)
    a = SGMCMC(_model, **kw).run(jax.random.PRNGKey(0))
    b = SGMCMC(_model, chain_sharding=_chain_sharding(),
               **kw).run(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(a.unconstrained),
                               np.asarray(b.unconstrained),
                               rtol=1e-5, atol=1e-6)


def test_pt_sharded_matches_unsharded():
    from bayesic_tpu.infer.mcmc import ParallelTempering

    # short horizon: HMC trajectories are chaotic, so different SPMD
    # partitionings legitimately diverge in f32 over long runs (the C13a
    # rule checked here is the short-horizon bit-compatibility one; the
    # long-run check is distributional, as in tests/test_sharding.py)
    kw = dict(num_replicas=4, num_warmup=4, num_samples=4, num_chains=8,
              num_leapfrog=4)
    a = ParallelTempering(_model, **kw).run(jax.random.PRNGKey(1))
    b = ParallelTempering(_model, chain_sharding=_chain_sharding(),
                          **kw).run(jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(a.unconstrained),
                               np.asarray(b.unconstrained),
                               rtol=1e-2, atol=5e-3)

    # long-run distributional agreement on the posterior mean/std
    kw = dict(num_replicas=4, num_warmup=200, num_samples=400,
              num_chains=8)
    a = ParallelTempering(_model, **kw).run(jax.random.PRNGKey(3))
    b = ParallelTempering(_model, chain_sharding=_chain_sharding(),
                          **kw).run(jax.random.PRNGKey(3))
    da = np.asarray(a.unconstrained).reshape(-1)
    db = np.asarray(b.unconstrained).reshape(-1)
    assert abs(da.mean() - db.mean()) < 0.05
    assert abs(da.std() - db.std()) < 0.05


def test_ess_sharded_matches_unsharded():
    from bayesic_tpu.infer.mcmc.ess import EllipticalSlice

    def model():
        z = sample("z", dist.Normal(0.0, 1.0))
        sample("obs", dist.Normal(2.0 * z, 1.0).expand((3,)).to_event(1),
               obs=jnp.asarray([0.7, 1.1, -0.2]))

    kw = dict(num_samples=80, num_burnin=40, num_chains=8)
    a = EllipticalSlice(model, **kw).run(jax.random.PRNGKey(2))
    b = EllipticalSlice(model, chain_sharding=_chain_sharding(),
                        **kw).run(jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(a.unconstrained),
                               np.asarray(b.unconstrained),
                               rtol=1e-5, atol=1e-6)


def test_cached_programs_honor_fresh_keys():
    """Regression (r2 code review): the cached jitted run programs must
    thread the PRNG key as a traced argument — a closed-over key gets
    baked into the compiled program, silently freezing all later runs."""
    from bayesic_tpu.infer.mcmc import ParallelTempering
    from bayesic_tpu.infer.mcmc.ess import EllipticalSlice
    from bayesic_tpu.infer.svgd import SVGD

    def gauss():
        z = sample("z", dist.Normal(0.0, 1.0))
        sample("obs", dist.Normal(2.0 * z, 1.0).expand((3,)).to_event(1),
               obs=jnp.asarray([0.7, 1.1, -0.2]))

    for make, get in [
        (lambda: EllipticalSlice(gauss, num_samples=40, num_burnin=10,
                                 num_chains=2),
         lambda r: np.asarray(r.unconstrained)),
        (lambda: ParallelTempering(gauss, num_replicas=2, num_warmup=10,
                                   num_samples=20, num_chains=2,
                                   num_leapfrog=3),
         lambda r: np.asarray(r.unconstrained)),
        (lambda: SVGD(gauss, num_particles=16, num_steps=30),
         lambda r: np.asarray(r.unconstrained)),
    ]:
        inst = make()
        first = get(inst.run(jax.random.PRNGKey(0)))
        second = get(inst.run(jax.random.PRNGKey(1)))   # cached program
        fresh = get(make().run(jax.random.PRNGKey(1)))  # fresh instance
        assert not np.allclose(first, second)           # keys differ
        np.testing.assert_allclose(second, fresh, rtol=1e-5, atol=1e-6)
