"""Parity tests for the fused dense-MF kernel (ops/mf_dense.py): the
kernel's value+grad must equal jax.value_and_grad of the XLA objective
(models/matrix_fact.dense_neg_elbo).  The objective is deterministic (no
RNG), so interpret mode on CPU exercises the real math exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesic_tpu.models import matrix_fact as mf
from bayesic_tpu.ops import mf_dense


def _setup(nu=40, ni=25, k=4, n_ratings=1500, noise=0.5, seed=0):
    cfg = mf.Config(num_users=nu, num_items=ni, num_factors=k,
                    num_ratings=n_ratings, noise=noise, seed=seed)
    users, items, ratings, _ = mf.make_data(cfg)
    cnt, rsum, sqsum, n = mf.dense_stats(users, items, ratings, nu, ni)
    params = mf.dense_init(cfg, jax.random.PRNGKey(1), init_scale=0.15)
    # move off the symmetric init point
    leaves, treedef = jax.tree_util.tree_flatten(params)
    ks = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    leaves = [x + 0.2 * jax.random.normal(kk, jnp.shape(x))
              for x, kk in zip(leaves, ks)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    return cfg, params, cnt, rsum, sqsum, n


@pytest.mark.parametrize("block_items", [128, 256])
def test_value_and_grad_parity(block_items):
    cfg, params, cnt, rsum, sqsum, n = _setup()
    cnt_p, rsum_p = mf_dense.pack_stats(cnt, rsum, block_items)
    loss_k, grads_k = mf_dense.dense_value_and_grad(
        params, cnt_p, rsum_p, sqsum, n, cfg.noise,
        block_items=block_items, interpret=True)
    loss_x, grads_x = jax.value_and_grad(mf.dense_neg_elbo)(
        params, cnt, rsum, sqsum, n, cfg.noise)
    assert float(loss_k) == pytest.approx(float(loss_x), rel=2e-5)
    flat_k = jax.tree_util.tree_leaves(grads_k)
    flat_x = jax.tree_util.tree_leaves(grads_x)
    for a, b in zip(flat_k, flat_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-3)


def test_parity_with_ragged_padding():
    """Shapes that need both row (sublane) and item (block) padding."""
    cfg, params, cnt, rsum, sqsum, n = _setup(nu=37, ni=45, k=3,
                                              n_ratings=900)
    cnt_p, rsum_p = mf_dense.pack_stats(cnt, rsum, 128)
    assert cnt_p.shape == (40, 128)
    loss_k, grads_k = mf_dense.dense_value_and_grad(
        params, cnt_p, rsum_p, sqsum, n, cfg.noise, interpret=True)
    loss_x, grads_x = jax.value_and_grad(mf.dense_neg_elbo)(
        params, cnt, rsum, sqsum, n, cfg.noise)
    assert float(loss_k) == pytest.approx(float(loss_x), rel=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(grads_k),
                    jax.tree_util.tree_leaves(grads_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-3)


def test_fused_train_matches_xla_path():
    """Both training loops are deterministic with the same init — the loss
    trajectories must track each other closely."""
    import optax

    cfg, params, cnt, rsum, sqsum, n = _setup(nu=30, ni=20, k=3,
                                              n_ratings=1200)
    steps = 200
    p_k, _, losses_k = mf_dense.fused_train(
        params, cnt, rsum, sqsum, n, cfg.noise, steps=steps, lr=0.02,
        interpret=True)

    opt = optax.adam(0.02)

    def body(carry, _):
        p, st = carry
        loss, g = jax.value_and_grad(mf.dense_neg_elbo)(
            p, cnt, rsum, sqsum, n, cfg.noise)
        upd, st = opt.update(g, st, p)
        return (optax.apply_updates(p, upd), st), loss

    (p_x, _), losses_x = jax.lax.scan(body, (params, opt.init(params)),
                                      None, length=steps)
    np.testing.assert_allclose(np.asarray(losses_k), np.asarray(losses_x),
                               rtol=5e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p_k),
                    jax.tree_util.tree_leaves(p_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_bf16_matmul_path_close():
    """mm_dtype=bfloat16 rounds matmul operands only — grads stay within
    ~1% of f32 (mixed-precision contract)."""
    cfg, params, cnt, rsum, sqsum, n = _setup()
    cnt_p, rsum_p = mf_dense.pack_stats(cnt, rsum, 128)
    loss_b, grads_b = mf_dense.dense_value_and_grad(
        params, cnt_p, rsum_p, sqsum, n, cfg.noise,
        mm_dtype="bfloat16", interpret=True)
    loss_f, grads_f = mf_dense.dense_value_and_grad(
        params, cnt_p, rsum_p, sqsum, n, cfg.noise, interpret=True)
    assert float(loss_b) == pytest.approx(float(loss_f), rel=2e-2)
    for a, b in zip(jax.tree_util.tree_leaves(grads_b),
                    jax.tree_util.tree_leaves(grads_f)):
        scale = np.maximum(np.abs(np.asarray(b)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=3e-2)
