"""Fused Pallas NUTS transition for hier-logistic (ops/fused_nuts_hier.py).

Layered validation mirroring tests/test_fused_nuts.py:

1. the lane-packed potential/gradient equals build_logjoint's
   unconstrained density and jax.grad exactly (design-matrix packing,
   prior terms, constants), with pads behaving as N(0, 1) dims;
2. the Pallas kernel in interpret mode preserves the pe(q') invariant
   (wrapper correctness over the shared core);
3. the fused sampler through the MCMC driver reproduces the XLA NUTS
   posterior on a small hier-logistic config within MC error.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bayesic_tpu.core.logjoint import build_logjoint
from bayesic_tpu.infer.mcmc import MCMC
from bayesic_tpu.infer.svi.guides import unraveler
from bayesic_tpu.models import hier_logistic as hl
from bayesic_tpu.ops import fused_nuts_hier as fnh


def _setup(num_groups=8, obs_per_group=40, num_features=3, seed=0):
    cfg = hl.Config(num_groups=num_groups, obs_per_group=obs_per_group,
                    num_features=num_features, seed=seed)
    x, y, group, truth = hl.make_data(cfg)
    model = hl.make_model(num_groups, num_features, None, centered=True)
    return cfg, model, x, y, group


def test_hier_potential_matches_logjoint():
    """pe and grad of the lane-packed design must equal the model's
    -log-density and its jax.grad (constants included) on the real lanes,
    and be exactly N(0, 1) on the pad lanes."""
    cfg, model, x, y, group = _setup()
    info, logdensity, _, _ = build_logjoint(model, x, y, group)
    dim, unravel, _ = unraveler(info)
    assert dim == 2 + cfg.num_groups + cfg.num_features

    a, a_t, y_row, w_row = fnh.build_design(x, y, group, cfg.num_groups)
    pg = fnh.make_hier_potential(a, a_t, y_row, w_row, cfg.num_groups,
                                 cfg.num_features)
    rng = np.random.default_rng(0)
    c = 8
    q = np.zeros((c, 128), np.float32)
    q[:, :dim] = rng.normal(0.0, 0.7, (c, dim))
    q[:, dim:] = rng.normal(0.0, 1.0, (c, 128 - dim))
    qj = jnp.asarray(q)
    pe, grad = pg(qj)

    def pot(qq):
        return -logdensity(unravel(qq))

    pe_ref = jax.vmap(pot)(qj[:, :dim])
    g_ref = jax.vmap(jax.grad(pot))(qj[:, :dim])
    pad_pe = 0.5 * jnp.sum(qj[:, dim:] ** 2, axis=1)

    # per-chain potential is a (C, 1) vector (round-5 convention)
    assert pe.shape == (q.shape[0], 1)
    np.testing.assert_allclose(np.asarray(pe[:, 0] - pad_pe),
                               np.asarray(pe_ref), rtol=2e-6, atol=2e-4)
    np.testing.assert_allclose(np.asarray(grad[:, :dim]),
                               np.asarray(g_ref), rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(grad[:, dim:]),
                               q[:, dim:], rtol=1e-6, atol=1e-6)


def test_hier_precision_split_potential_accuracy():
    """mm_dtype="split": pe must match the f32 potential to ~f32
    accuracy (it enters the MH/multinomial weights); the bf16 gradient
    is trajectory-quality-only and gets bf16-level tolerance."""
    cfg, model, x, y, group = _setup()
    a, a_t, y_row, w_row = fnh.build_design(x, y, group, cfg.num_groups)
    pg32 = fnh.make_hier_potential(a, a_t, y_row, w_row, cfg.num_groups,
                                   cfg.num_features)
    pg_s = fnh.make_hier_potential(a, a_t, y_row, w_row, cfg.num_groups,
                                   cfg.num_features, mm_dtype="split")
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(0.0, 0.7, (8, 128)), jnp.float32)
    pe32, g32 = pg32(q)
    pe_s, g_s = pg_s(q)
    np.testing.assert_allclose(np.asarray(pe_s)[:, 0],
                               np.asarray(pe32)[:, 0], rtol=1e-4)
    scale = float(jnp.max(jnp.abs(g32)))
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g32),
                               atol=2e-2 * scale)


def test_hier_kernel_interpret_pe_invariant():
    """Interpret-mode kernel: the returned pe must equal pe(q') for the
    returned q' (state consistency through the Mosaic wrapper), and the
    transition must move every chain at a reasonable step size."""
    cfg, model, x, y, group = _setup()
    dim = 2 + cfg.num_groups + cfg.num_features
    a, a_t, y_row, w_row = fnh.build_design(x, y, group, cfg.num_groups)
    # same mm_dtype as the transition's default ("split"): the invariant
    # under test is state consistency through the Mosaic wrapper, so the
    # reference potential must use the identical dot configuration (split
    # gradients are bf16 surrogates and only match themselves)
    pg = fnh.make_hier_potential(a, a_t, y_row, w_row, cfg.num_groups,
                                 cfg.num_features, mm_dtype="split")
    c, kk = 8, 5
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(0.0, 0.5, (c, 128)), jnp.float32)
    key = jax.random.PRNGKey(2)
    k_m, k_d, k_a, k_l = jax.random.split(key, 4)
    mom = jax.random.normal(k_m, (c, 128), jnp.float32)
    sd = jnp.where(jax.random.bernoulli(k_d, 0.5, (c, kk)), 1.0,
                   -1.0).astype(jnp.float32)
    lua = jnp.log(jax.random.uniform(k_a, (c, kk), jnp.float32,
                                     minval=1e-6))
    lul = jnp.log(jax.random.uniform(k_l, (c, 1 << kk), jnp.float32,
                                     minval=1e-6))
    inv_mass = jnp.ones((1, 128), jnp.float32)
    q2, pe2, g2, acc, div, depth, nsteps, h0 = fnh.fused_hier_nuts_transition(
        q, mom, sd, lua, lul, jnp.full((1, 1), 0.1, jnp.float32), inv_mass,
        a, a_t, y_row, w_row, num_groups=cfg.num_groups,
        num_features=cfg.num_features, block_chains=c, max_doublings=kk,
        interpret=True)
    pe_chk, g_chk = pg(q2)
    np.testing.assert_allclose(np.asarray(pe2)[:, 0],
                               np.asarray(pe_chk)[:, 0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g_chk),
                               rtol=1e-4, atol=1e-4)
    assert bool(jnp.all(jnp.any(q2 != q, axis=1)))
    assert float(jnp.max(div)) == 0.0
    assert dim <= q2.shape[1]


def test_fused_hier_sampler_matches_xla_nuts_posterior():
    """End-to-end through the MCMC driver: fused transition (interpret)
    vs the per-chain XLA NUTS on the same centered hier-logistic model —
    marginal moments must agree within MC error.  Pads are redrawn each
    transition (exact Gibbs on the extended target), so only the
    posterior law is comparable, not the sample path."""
    cfg, model, x, y, group = _setup(num_groups=6, obs_per_group=50,
                                     num_features=2)
    chains, warm, samp = 16, 150, 150
    bt = fnh.make_batched_transition_hier(
        x, y, group, cfg.num_groups, cfg.num_features, max_doublings=5,
        block_chains=chains, interpret=True)
    mcmc_f = MCMC(model=model, num_warmup=warm, num_samples=samp,
                  num_chains=chains, shared_adapt=True,
                  model_args=(x, y, group), target_accept=0.85,
                  batched_transition=bt)
    res_f = mcmc_f.run(jax.random.PRNGKey(0))

    mcmc_x = MCMC(model=model, num_warmup=warm, num_samples=samp,
                  num_chains=chains, shared_adapt=True,
                  model_args=(x, y, group), target_accept=0.85)
    res_x = mcmc_x.run(jax.random.PRNGKey(1))

    for site in ("mu", "tau", "theta", "beta"):
        f = np.asarray(res_f.samples[site]).reshape(warm * 0 + samp * chains,
                                                    -1)
        xs = np.asarray(res_x.samples[site]).reshape(samp * chains, -1)
        se = (f.std(0) + xs.std(0)) / np.sqrt(200.0) + 0.02
        np.testing.assert_array_less(
            np.abs(f.mean(0) - xs.mean(0)), 5 * se,
            err_msg=f"posterior mean mismatch at site {site}")
        np.testing.assert_allclose(f.std(0), xs.std(0), rtol=0.3,
                                   atol=0.05,
                                   err_msg=f"posterior std mismatch at "
                                           f"site {site}")
    # this tiny weak-data config is funnel-prone (6 groups x 50 obs,
    # centered) and diverges occasionally on BOTH paths at
    # target_accept=0.85.  The rate is sensitive to the adapted step:
    # reassociation-level (1e-7-relative) potential noise shifts the DA
    # equilibrium and moved it 2% -> 8% across kernel-precision refactors
    # while the posterior-moment assertions above stayed green.  Gate on
    # "small-ish and the moments match", not an exact historical rate.
    div_f = int(np.asarray(res_f.extra["diverging"]).sum())
    div_x = int(np.asarray(res_x.extra["diverging"]).sum())
    total = samp * chains
    assert div_f < 0.15 * total, (div_f, total)
    assert div_x < 0.15 * total, (div_x, total)
