"""Fused hier-logistic trainer (ops/fused_hier.py) parity tests.

The strongest check: `_step_math`'s hand-derived (elbo, grads) must equal
jax.grad of the REAL DSL pipeline (build_logjoint + MeanFieldGuide STL
ELBO) on the same block minibatch, same injected noise — this validates
the backward AND the (N, 128) packing in one shot.  Then the end-to-end
reference trainer must recover the known posterior structure.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bayesic_tpu.core.logjoint import build_logjoint
from bayesic_tpu.models import hier_logistic as hl
from bayesic_tpu.ops import fused_hier as fh

_C = 0.5 * float(np.log(2.0 * np.pi))


def _setup():
    cfg = hl.Config(num_groups=fh.J, obs_per_group=40,
                    num_features=fh.D, batch_size=256)
    x, y, group, truth = hl.make_data(cfg)
    packed = fh.pack_data(x, y, group)
    model = hl.make_model(fh.J, fh.D, cfg.batch_size)
    info, logdensity, _, _ = build_logjoint(model, x, y, group)
    return cfg, x, y, group, packed, info, logdensity, truth


def _lanes_from_flat(flat57):
    v = np.zeros((1, 128), np.float32)
    v[0, :fh.DIM] = np.asarray(flat57)
    return jnp.asarray(v)


def test_step_math_matches_dsl_autodiff():
    cfg, x, y, group, packed, info, logdensity, _ = _setup()
    b = cfg.batch_size
    n = x.shape[0]
    rng = np.random.default_rng(0)
    loc57 = rng.normal(0, 0.5, fh.DIM).astype(np.float32)
    ls57 = rng.normal(-2.0, 0.3, fh.DIM).astype(np.float32)
    eps57 = rng.normal(0, 1, fh.DIM).astype(np.float32)
    off = 37
    idx = (off + jnp.arange(b)) % n

    from bayesic_tpu.infer.svi.guides import unraveler
    dim, unravel, _ = unraveler(info)
    assert dim == fh.DIM

    def elbo_dsl(loc, ls):
        z = loc + jnp.exp(ls) * jnp.asarray(eps57)
        lp = logdensity(unravel(z), subsample={"data__idx": idx})
        # STL logq: q-params stopped, z-path live
        locs, lss = jax.lax.stop_gradient(loc), jax.lax.stop_gradient(ls)
        zz = (z - locs) * jnp.exp(-lss)
        logq = jnp.sum(-0.5 * zz * zz - lss - _C)
        return lp - logq

    ref_elbo = float(elbo_dsl(jnp.asarray(loc57), jnp.asarray(ls57)))
    g_loc_ref, g_ls_ref = jax.grad(elbo_dsl, argnums=(0, 1))(
        jnp.asarray(loc57), jnp.asarray(ls57))

    xb = jnp.concatenate([packed, packed[:b]], 0)[off:off + b]
    elbo, g_loc, g_ls = fh._step_math(
        _lanes_from_flat(loc57), _lanes_from_flat(ls57), xb,
        _lanes_from_flat(eps57), n / b)

    np.testing.assert_allclose(float(elbo), ref_elbo, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g_loc)[0, :fh.DIM],
                               np.asarray(g_loc_ref), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(g_ls)[0, :fh.DIM],
                               np.asarray(g_ls_ref), rtol=2e-4,
                               atol=2e-4)
    # masked lanes never receive gradient
    assert np.all(np.asarray(g_loc)[0, fh.DIM:] == 0.0)
    assert np.all(np.asarray(g_ls)[0, fh.DIM:] == 0.0)


def test_reference_train_recovers_posterior():
    cfg, x, y, group, packed, info, logdensity, truth = _setup()
    perm = np.random.default_rng(1).permutation(x.shape[0])
    packed = packed[perm]
    loc, ls = fh.pack_params()
    loc, ls, opt, losses = fh.fused_train(
        packed, loc, ls, steps=3000, lr0=0.03, seed=3,
        batch=cfg.batch_size, interpret=True)
    assert np.isfinite(np.asarray(losses)).all()
    assert float(losses[-1]) < float(losses[0])
    mean, std = fh.unpack_stats(loc, ls)
    # compare to the XLA SVI path on the same data
    import optax
    from bayesic_tpu.infer.svi import SVI, MeanFieldGuide
    model = hl.make_model(fh.J, fh.D, cfg.batch_size)
    svi = SVI(model, MeanFieldGuide,
              optax.adam(optax.cosine_decay_schedule(0.03, 3000)),
              model_args=(x, y, group))
    res = svi.run(jax.random.PRNGKey(0), 3000)
    m_ref, s_ref = svi.guide.stats(res.params)
    np.testing.assert_allclose(mean["mu"], float(m_ref["mu"]), atol=0.15)
    np.testing.assert_allclose(mean["beta"], np.asarray(m_ref["beta"]),
                               atol=0.1)
    np.testing.assert_allclose(
        mean["theta_raw"], np.asarray(m_ref["theta_raw"]), atol=0.35)
    # posterior recovers the generating parameters
    np.testing.assert_allclose(mean["beta"], truth["beta"], atol=0.25)
