"""Fused linreg trainer parity: hand-derived step vs jax.grad of the DSL
pipeline, and end-to-end recovery of the analytic posterior."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesic_tpu.core.logjoint import build_logjoint
from bayesic_tpu.models import linreg
from bayesic_tpu.ops import fused_linreg as fl

_C = 0.5 * float(np.log(2.0 * np.pi))


def test_step_math_matches_dsl_autodiff():
    cfg = linreg.Config(n=512, dim=16)
    x, y, _, _ = linreg.make_data(cfg)
    packed = fl.pack_data(x, y)
    info, logdensity, _, _ = build_logjoint(
        linreg.model, x, y, cfg.noise)
    from bayesic_tpu.infer.svi.guides import unraveler
    dim, unravel, _ = unraveler(info)
    assert dim == cfg.dim + 1

    rng = np.random.default_rng(0)
    loc_f = rng.normal(0, 0.5, dim).astype(np.float32)
    ls_f = rng.normal(-2, 0.3, dim).astype(np.float32)
    eps_f = rng.normal(0, 1, dim).astype(np.float32)

    def lanes(v):
        out = np.zeros((1, 128), np.float32)
        out[0, :dim] = v
        return jnp.asarray(out)

    def elbo_dsl(loc, ls):
        z = loc + jnp.exp(ls) * jnp.asarray(eps_f)
        lp = logdensity(unravel(z))
        locs, lss = jax.lax.stop_gradient(loc), jax.lax.stop_gradient(ls)
        zz = (z - locs) * jnp.exp(-lss)
        return lp - jnp.sum(-0.5 * zz * zz - lss - _C)

    ref = float(elbo_dsl(jnp.asarray(loc_f), jnp.asarray(ls_f)))
    gl_ref, gs_ref = jax.grad(elbo_dsl, argnums=(0, 1))(
        jnp.asarray(loc_f), jnp.asarray(ls_f))

    elbo, g_loc, g_ls = fl._step_math(lanes(loc_f), lanes(ls_f),
                                      fl.gram(packed), cfg.n,
                                      lanes(eps_f), cfg.dim, cfg.noise)
    # NOTE: lane order (w..., b) == unraveler order (w, b)
    np.testing.assert_allclose(float(elbo), ref, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g_loc)[0, :dim],
                               np.asarray(gl_ref), rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g_ls)[0, :dim],
                               np.asarray(gs_ref), rtol=2e-4, atol=2e-3)
    assert np.all(np.asarray(g_loc)[0, dim:] == 0.0)


def test_reference_train_matches_analytic_posterior():
    cfg = linreg.Config(n=2048, dim=16, steps=2500)
    x, y, _, _ = linreg.make_data(cfg)
    packed = fl.pack_data(x, y)
    loc, ls = fl.pack_params(cfg.dim)
    loc, ls, opt, losses = fl.fused_train(
        packed, cfg.dim, cfg.noise, loc, ls, steps=cfg.steps, lr0=0.05,
        seed=2, interpret=True)
    assert float(losses[-1]) < float(losses[0])
    mean, std = fl.unpack_stats(loc, ls, cfg.dim)
    ref_mean, ref_cov = linreg.analytic_posterior(x, y, cfg.noise)
    got = np.concatenate([mean["w"], [mean["b"]]])
    np.testing.assert_allclose(got, ref_mean, atol=0.02)
    ref_sd = np.sqrt(np.diag(ref_cov))
    got_sd = np.concatenate([std["w"], [std["b"]]])
    # mean-field scale under cosine decay converges slower than the mean;
    # absolute slack covers the residual optimization error at 2.5k steps
    np.testing.assert_allclose(got_sd, ref_sd, rtol=0.3, atol=0.01)
