"""Parity tests for the whole-run fused DLGM trainer (ops/fused_vae.py).

SURVEY.md §4.7: every Pallas kernel vs its pure-jnp fallback, and the
hand-written backward vs autodiff.  Streams (minibatch indices, noise) are
injected so the kernel (interpret mode on CPU) and the reference run the
identical computation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from bayesic_tpu.ops import fused_vae as fv

DIMS = fv.FusedVAEDims(n=200, d=12, h=16, z=4, b=32)


def _init(key):
    shapes = fv.leaf_shapes(DIMS)
    params, m, v = {}, {}, {}
    for i, name in enumerate(fv.LEAVES):
        k = jax.random.fold_in(key, i)
        s = shapes[name]
        if name.startswith("w"):
            params[name] = jax.random.normal(k, s) / np.sqrt(s[0])
        else:
            params[name] = jnp.zeros(s)
        m[name] = jnp.zeros(s)
        v[name] = jnp.zeros(s)
    return params, m, v


def _data(key):
    return jax.random.normal(key, (DIMS.n, DIMS.d))


def _streams(key, steps):
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (steps, DIMS.b), 0, DIMS.n)
    eps = jax.random.normal(k2, (steps, DIMS.b, DIMS.z))
    return idx, eps


def test_hand_backward_matches_autodiff():
    """_step_math's hand-derived grads == jax.grad of its forward value
    (with the STL stop-gradient structure made explicit)."""
    key = jax.random.PRNGKey(0)
    params, _, _ = _init(key)
    p = tuple(fv._flatten(params))
    x = _data(jax.random.fold_in(key, 99))
    idx, eps = _streams(jax.random.fold_in(key, 98), 1)
    xb, eps0 = x[idx[0]], eps[0]
    scale = DIMS.n / DIMS.b

    elbo, grads = fv._step_math(p, xb, eps0, scale)

    def value(p):
        # recompute the STL elbo: q-params stopped inside logq only
        (w1e, b1e, wmu, bmu, wsig, bsig, w1d, b1d, w2d, b2d, usig) = p
        c = fv._C
        h1 = jnp.tanh(xb @ w1e + b1e)
        mu = h1 @ wmu + bmu
        pre = h1 @ wsig + bsig
        ls = jnp.clip(pre, -6.0, 3.0)
        z = mu + jnp.exp(ls) * eps0
        mu_q, ls_q = jax.lax.stop_gradient((mu, ls))
        zz = (z - mu_q) * jnp.exp(-ls_q)
        logq = jnp.sum(-0.5 * zz * zz - ls_q - c)
        hd = jnp.tanh(z @ w1d + b1d)
        mx = hd @ w2d + b2d
        s0 = usig[0, 0]
        prior = jnp.sum(-0.5 * z * z - c)
        lik = jnp.sum(-0.5 * (mx - xb) ** 2 * jnp.exp(-2 * s0) - s0 - c)
        return scale * (prior + lik - logq)

    np.testing.assert_allclose(float(elbo), float(value(p)), rtol=1e-5)
    auto = jax.grad(value)(p)
    for name, g, ga in zip(fv.LEAVES, grads, auto):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(ga), rtol=2e-4, atol=2e-5,
            err_msg=name)


def test_adam_matches_optax():
    key = jax.random.PRNGKey(1)
    params, m, v = _init(key)
    p = tuple(fv._flatten(params))
    grads = tuple(jax.random.normal(jax.random.fold_in(key, i), q.shape)
                  for i, q in enumerate(p))
    mt = tuple(fv._flatten(m))
    vt = tuple(fv._flatten(v))
    lr = 3e-3
    p1, m1, v1 = fv._adam(p, mt, vt, grads, 1.0, lr)
    p2, m2, v2 = fv._adam(p1, m1, v1, grads, 2.0, lr)

    opt = optax.adam(lr)
    st = opt.init(p)
    # fused grads are ascent directions; optax consumes descent grads
    desc = tuple(-g for g in grads)
    u, st = opt.update(desc, st, p)
    q1 = optax.apply_updates(p, u)
    u, st = opt.update(desc, st, q1)
    q2 = optax.apply_updates(q1, u)
    for a, b in zip(p2, q2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_kernel_matches_reference_injected_streams():
    """Interpret-mode kernel (one-hot gather path) == jnp reference scan,
    end-to-end over several steps: params, Adam state and losses."""
    key = jax.random.PRNGKey(2)
    params, m, v = _init(key)
    x = _data(jax.random.fold_in(key, 99))
    steps = 5
    idx, eps = _streams(jax.random.fold_in(key, 98), steps)
    lr = 1e-2

    p_ref, m_ref, v_ref, l_ref = fv.reference_train(
        x, params, m, v, idx_stream=idx, eps_stream=eps, lr=lr)
    p_k, m_k, v_k, l_k = fv.fused_train_injected(
        x, params, m, v, idx_stream=idx, eps_stream=eps, lr=lr,
        interpret=True)

    np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_ref),
                               rtol=1e-4, atol=1e-3)
    for name in fv.LEAVES:
        np.testing.assert_allclose(
            np.asarray(p_k[name]), np.asarray(p_ref[name]),
            rtol=1e-4, atol=1e-5, err_msg=name)
        np.testing.assert_allclose(
            np.asarray(v_k[name]), np.asarray(v_ref[name]),
            rtol=1e-3, atol=1e-6, err_msg="v_" + name)


def test_reference_train_learns():
    """Sanity: the step math actually optimizes the ELBO (loss falls) and
    sigma_x moves toward the data noise scale."""
    key = jax.random.PRNGKey(3)
    params, m, v = _init(key)
    x = _data(jax.random.fold_in(key, 99)) * 0.5
    steps = 400
    idx, eps = _streams(jax.random.fold_in(key, 98), steps)
    p, _, _, losses = fv.reference_train(
        x, params, m, v, idx_stream=idx, eps_stream=eps, lr=1e-2)
    assert float(losses[-20:].mean()) < float(losses[:20].mean())
    assert np.isfinite(np.asarray(losses)).all()
    sig = float(np.exp(np.asarray(p["usig"])[0, 0]))
    assert 0.05 < sig < 1.5
