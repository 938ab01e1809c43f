"""Fused Pallas NUTS transition (ops/fused_nuts.py, SURVEY.md C14(a);
VERDICT r3 item 2).  Layered validation:

1. the lane-packed potential/gradient equals the model's log-density and
   jax.grad exactly (packing correctness);
2. the shared transition core behaves like a NUTS transition (divergence
   flagging, energy bookkeeping, U-turn termination);
3. the Pallas kernel in interpret mode is bit-equal to the shared core
   called directly (Mosaic wrapper correctness);
4. the fused sampler through the MCMC driver reproduces the XLA NUTS
   posterior on a small DLGM local posterior within MC error.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesic_tpu.models import dlgm
from bayesic_tpu.ops import fused_nuts as fn


def _setup(nb=32, latent=8, hidden=16, data_dim=8, chains=8, seed=0):
    cfg = dlgm.Config(num_data=max(nb, 64), data_dim=data_dim,
                      latent_dim=latent, hidden=hidden,
                      num_chains=chains, num_warmup=60, num_samples=60)
    rng = np.random.default_rng(seed)
    dec = dlgm.Decoder(data_dim, hidden)
    dec_params = dec.init(jax.random.PRNGKey(seed),
                          jnp.zeros((1, latent)))
    x_batch = jnp.asarray(rng.normal(0, 1.0, (nb, data_dim)), jnp.float32)
    sigma = 0.4
    return cfg, dec, dec_params, x_batch, sigma


def _packed(cfg, dec_params, x_batch, sigma, block_chains):
    nb, data_dim = x_batch.shape
    w1p, w2p, w1pt, w2pt, b1p, b2p = fn.pack_decoder(
        dec_params, cfg.latent_dim, cfg.hidden, data_dim)
    x_rep = fn.pack_x(x_batch, cfg.latent_dim, block_chains)
    r = 128 // cfg.latent_dim
    pg = fn.make_packed_potential(
        w1p, w2p, w1pt, w2pt, b1p, b2p, x_rep, sigma, nb // r,
        block_chains, nb, cfg.latent_dim, data_dim)
    packed = (w1p, w2p, w1pt, w2pt, b1p, b2p, x_rep)
    return pg, packed


def test_packed_potential_matches_model():
    """pe and grad of the lane-packed decoder must equal the model's
    -log-density and its jax.grad (constants included)."""
    cfg, dec, dec_params, x_batch, sigma = _setup()
    nb = x_batch.shape[0]
    d = nb * cfg.latent_dim
    c = 8
    pg, _ = _packed(cfg, dec_params, x_batch, sigma, c)

    def pot(q):
        z = q.reshape(nb, cfg.latent_dim)
        mu = dec.apply(dec_params, z)
        lp = (jnp.sum(-0.5 * z * z - 0.5 * np.log(2 * np.pi))
              + jnp.sum(-0.5 * ((x_batch - mu) / sigma) ** 2
                        - np.log(sigma) - 0.5 * np.log(2 * np.pi)))
        return -lp

    q = jax.random.normal(jax.random.PRNGKey(3), (c, d)) * 0.7
    pe, grad = pg(q)
    pe_ref = jax.vmap(pot)(q)
    grad_ref = jax.vmap(jax.grad(pot))(q)
    np.testing.assert_allclose(np.asarray(pe)[:, 0], np.asarray(pe_ref),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(grad_ref),
                               rtol=2e-4, atol=2e-4)


def _randoms(keys, c, kk):
    """Direction signs and log-uniforms, as make_batched_transition
    draws them (ops/fused_nuts.py: randomness enters in log space)."""
    sign_dir = jnp.where(jax.random.bernoulli(keys[0], 0.5, (c, kk)),
                         1.0, -1.0).astype(jnp.float32)
    log_u_acc = jnp.log(jnp.maximum(
        jax.random.uniform(keys[1], (c, kk), jnp.float32), 1e-38))
    log_u_leaf = jnp.log(jnp.maximum(
        jax.random.uniform(keys[2], (c, 1 << kk), jnp.float32), 1e-38))
    return sign_dir, log_u_acc, log_u_leaf


def _core_inputs(cfg, x_batch, sigma, dec_params, c, key, kk=5):
    d = x_batch.shape[0] * cfg.latent_dim
    pg, packed = _packed(cfg, dec_params, x_batch, sigma, c)
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (c, d)) * 0.5
    pe, grad = pg(q)
    mom = jax.random.normal(ks[1], (c, d))
    sign_dir, log_u_acc, log_u_leaf = _randoms(ks[2:5], c, kk)
    return pg, packed, (q, pe, grad, mom, sign_dir, log_u_acc, log_u_leaf)


def test_core_divergence_and_energy():
    """Absurd step size: every chain must flag diverging and keep a finite
    state (the proposal can only be a visited leaf)."""
    cfg, dec, dec_params, x_batch, sigma = _setup()
    c = 8
    pg, _, (q, pe, grad, mom, ud, ua, ul) = _core_inputs(
        cfg, x_batch, sigma, dec_params, c, jax.random.PRNGKey(0))
    inv_mass = jnp.ones((1, q.shape[1]))
    out = fn._nuts_transition_core(q, pe, grad, mom, ud, ua, ul,
                                   jnp.asarray(80.0), inv_mass, pg, 5)
    q2, pe2, g2, acc, div, depth, nsteps, h0 = out
    assert bool(jnp.all(div))
    assert np.isfinite(np.asarray(q2)).all()
    assert float(jnp.max(acc)) < 0.05
    # h0 = pe + ke must match the inputs
    ke = 0.5 * jnp.sum(mom * mom, -1, keepdims=True)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(pe + ke),
                               rtol=1e-5)


def test_core_small_step_runs_to_cap():
    """A tiny step size cannot U-turn within the doubling cap: every chain
    reaches max_doublings and takes 2^K - 1 leapfrogs."""
    cfg, dec, dec_params, x_batch, sigma = _setup()
    c = 8
    kk = 4
    pg, _, (q, pe, grad, mom, ud, ua, ul) = _core_inputs(
        cfg, x_batch, sigma, dec_params, c, jax.random.PRNGKey(1), kk=kk)
    inv_mass = jnp.ones((1, q.shape[1]))
    out = fn._nuts_transition_core(q, pe, grad, mom, ud, ua, ul,
                                   jnp.asarray(1e-4), inv_mass, pg, kk)
    _, _, _, acc, div, depth, nsteps, _ = out
    assert not bool(jnp.any(div))
    assert bool(jnp.all(depth == kk))
    assert bool(jnp.all(nsteps == (1 << kk) - 1))
    assert float(jnp.min(acc)) > 0.99


def test_kernel_interpret_matches_core():
    """The Pallas wrapper (interpret mode, gridded over 2 chain blocks)
    must reproduce the shared core bit-for-bit."""
    cfg, dec, dec_params, x_batch, sigma = _setup(chains=16)
    c_total, c_blk, kk = 16, 8, 5
    nb, data_dim = x_batch.shape
    d = nb * cfg.latent_dim
    pg, packed = _packed(cfg, dec_params, x_batch, sigma, c_blk)
    w1p, w2p, w1pt, w2pt, b1p, b2p, x_rep = packed

    ks = jax.random.split(jax.random.PRNGKey(7), 5)
    q = jax.random.normal(ks[0], (c_total, d)) * 0.5
    # per block: the packed potential is defined on C-chain blocks
    pe = jnp.concatenate([pg(q[:c_blk])[0], pg(q[c_blk:])[0]])
    grad = jnp.concatenate([pg(q[:c_blk])[1], pg(q[c_blk:])[1]])
    mom = jax.random.normal(ks[1], (c_total, d))
    sign_dir, log_u_acc, log_u_leaf = _randoms(ks[2:5], c_total, kk)
    eps = jnp.asarray([[0.25]], jnp.float32)
    inv_mass = jnp.full((1, d), 0.9, jnp.float32)

    got = fn.fused_nuts_transition(
        q, pe, grad, mom, sign_dir, log_u_acc, log_u_leaf, eps, inv_mass,
        w1p, w2p, w1pt, w2pt, b1p, b2p, x_rep,
        sigma=sigma, n_groups=nb // (128 // cfg.latent_dim),
        block_chains=c_blk, nb=nb, latent_dim=cfg.latent_dim,
        data_dim=data_dim, max_doublings=kk, interpret=True,
        # pin to the reference pg's dtype: bit parity needs the SAME dot
        # configuration on both sides (the ships-by-default "split" path
        # has its own posterior-parity test below)
        mm_dtype="float32")

    # interpret mode consumes the PASSED pe/grad (the Mosaic build
    # recomputes them in-kernel — (C, 1) block loads have an unmixable
    # layout — but both are pg(q), so semantics agree; bit parity is
    # checked against the pass-through path)
    blocks = []
    for b in range(2):
        sl = slice(b * c_blk, (b + 1) * c_blk)
        blocks.append(fn._nuts_transition_core(
            q[sl], pe[sl], grad[sl], mom[sl], sign_dir[sl],
            log_u_acc[sl], log_u_leaf[sl], eps[0, 0], inv_mass, pg, kk))
    want = [jnp.concatenate([a, b]) for a, b in zip(*blocks)]

    for i_, (g_arr, w_arr) in enumerate(zip(got, want)):
        if i_ == 7:
            # h0: interpret-mode matmul accumulation order differs at the
            # 1e-7-relative level; everything downstream is bit-exact
            np.testing.assert_allclose(np.asarray(g_arr),
                                       np.asarray(w_arr), rtol=1e-5)
        else:
            np.testing.assert_array_equal(np.asarray(g_arr),
                                          np.asarray(w_arr))
    # and the transition actually moved at least one chain
    assert bool(jnp.any(got[0] != q))


def test_precision_split_potential_accuracy():
    """mm_dtype="split" (VERDICT r4 item 4): the 3-pass hi/lo bf16 value
    dots must reproduce the f32 potential to ~f32 accuracy (pe enters MH
    ratios), while the single-pass bf16 gradient dots stay within bf16
    tolerance of the exact gradient (trajectory-quality only)."""
    cfg, dec, dec_params, x_batch, sigma = _setup()
    nb = x_batch.shape[0]
    c = 8
    pg32, packed = _packed(cfg, dec_params, x_batch, sigma, c)
    w1p, w2p, w1pt, w2pt, b1p, b2p, x_rep = packed
    r = 128 // cfg.latent_dim
    pg_split = fn.make_packed_potential(
        w1p, w2p, w1pt, w2pt, b1p, b2p, x_rep, sigma, nb // r, c, nb,
        cfg.latent_dim, x_batch.shape[1], mm_dtype="split")

    q = jax.random.normal(jax.random.PRNGKey(3),
                          (c, nb * cfg.latent_dim)) * 0.7
    pe32, g32 = pg32(q)
    pe_s, g_s = pg_split(q)
    np.testing.assert_allclose(np.asarray(pe_s)[:, 0],
                               np.asarray(pe32)[:, 0], rtol=1e-4)
    scale = float(jnp.max(jnp.abs(g32)))
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g32),
                               atol=2e-2 * scale)


@pytest.mark.parametrize("mm_dtype", ["float32", "split"])
def test_fused_sampler_matches_xla_nuts_posterior(mm_dtype):
    """End-to-end through the MCMC driver: fused transition (interpret)
    vs the per-chain XLA NUTS on the same DLGM local posterior — marginal
    moments must agree within MC error.  The "split" variant runs bf16
    gradient dots in the tree: the invariant distribution must be
    unchanged (the acceptance weights use the exact potential)."""
    cfg, dec, dec_params, x_batch, sigma = _setup(
        nb=16, latent=8, hidden=16, data_dim=8, chains=16)
    cfg = cfg.__class__(**{**cfg.__dict__, "num_chains": 16,
                           "num_warmup": 150, "num_samples": 150})

    mcmc_f = dlgm.local_posterior_mcmc_fused(
        cfg, dec, dec_params, sigma, x_batch, max_doublings=5,
        block_chains=8, mm_dtype=mm_dtype, interpret=True)
    res_f = mcmc_f.run(jax.random.PRNGKey(0))

    mcmc_x, res_x = dlgm.local_posterior_mcmc(
        cfg, dec, dec_params, sigma, x_batch, jax.random.PRNGKey(1),
        shared_adapt=True)

    zf = np.asarray(res_f.samples["z"]).reshape(-1, 16 * 8)
    zx = np.asarray(res_x.samples["z"]).reshape(-1, 16 * 8)
    se = (zx.std(0) / np.sqrt(200.0) + zf.std(0) / np.sqrt(200.0)) + 0.02
    np.testing.assert_array_less(np.abs(zf.mean(0) - zx.mean(0)), 5 * se)
    np.testing.assert_allclose(zf.std(0), zx.std(0), rtol=0.25, atol=0.05)
    assert int(np.asarray(res_f.extra["diverging"]).sum()) == 0


def test_state_consistency_under_truncated_log_u():
    """Regression for the TPU lane-replication corruption: on real TPUs
    f32 matmuls run at reduced input precision, so a leaf uniform
    u ∈ (1-2⁻⁹, 1) replicated through the ones-matmul rounds to exactly
    1.0 → log u = 0 → the guaranteed first-leaf take was skipped and the
    zero-pe proposal sentinel could merge into the trajectory (the chain
    then carries pe=0 with a real q and flags divergence forever).  With
    log-space inputs AND the fresh-subtree guard, even adversarial
    log_u_leaf == 0.0 (exactly the truncated value) must preserve the
    invariant pe' == pe(q')."""
    cfg, dec, dec_params, x_batch, sigma = _setup()
    c, kk = 8, 5
    pg, _, (q, pe, grad, mom, sd, lua, lul) = _core_inputs(
        cfg, x_batch, sigma, dec_params, c, jax.random.PRNGKey(5), kk=kk)
    # adversarial: every leaf uniform "rounded to 1.0" (log u = 0)
    lul = jnp.zeros_like(lul)
    inv_mass = jnp.ones((1, q.shape[1]))
    for eps in (0.05, 0.2, 0.5):
        out = fn._nuts_transition_core(q, pe, grad, mom, sd, lua, lul,
                                       jnp.asarray(eps), inv_mass, pg, kk)
        q2, pe2 = out[0], out[1]
        pe_chk, _ = pg(q2)
        np.testing.assert_allclose(np.asarray(pe2)[:, 0],
                                   np.asarray(pe_chk)[:, 0], rtol=1e-6)


def test_batched_transition_requires_shared_adapt():
    from bayesic_tpu.infer.mcmc import MCMC

    cfg, dec, dec_params, x_batch, sigma = _setup()
    with pytest.raises(ValueError, match="shared_adapt"):
        dlgm_model = lambda: None  # noqa: E731 — never traced
        MCMC(model=None, potential_and_grad=lambda q: (0.0, q),
             example_q=jnp.zeros(4), shared_adapt=False,
             batched_transition=lambda *a: a)
