"""Pallas kernel parity tests (SURVEY.md §4.7): every C14 kernel vs its
pure-jnp fallback, in interpreter mode on CPU (logic parity) — compiled-TPU
parity is exercised by bench/TPU runs."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesic_tpu.ops import gmm_logprob, leapfrog


@pytest.fixture
def pallas_interpret(monkeypatch):
    monkeypatch.setenv("BAYESIC_PALLAS", "interpret")


def _gmm_inputs(n=777, d=3, p=13, k=4, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = jax.random.normal(ks[0], (n, d))
    lw = jax.nn.log_softmax(jax.random.normal(ks[1], (p, k)), -1)
    mus = jax.random.normal(ks[2], (p, k, d)) * 2
    sig = jnp.exp(jax.random.normal(ks[3], (p, k)) * 0.3)
    return x, lw, mus, sig


def test_gmm_loglik_fwd_parity(pallas_interpret):
    x, lw, mus, sig = _gmm_inputs()
    ref = gmm_logprob.gmm_loglik_reference(x, lw, mus, sig)
    got = gmm_logprob.gmm_loglik(x, lw, mus, sig)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5)


def test_gmm_loglik_grad_parity(pallas_interpret):
    x, lw, mus, sig = _gmm_inputs(n=300, p=9)

    g_ref = jax.grad(
        lambda a, b, c: gmm_logprob.gmm_loglik_reference(x, a, b, c).sum(),
        argnums=(0, 1, 2),
    )(lw, mus, sig)
    g_got = jax.grad(
        lambda a, b, c: gmm_logprob.gmm_loglik(x, a, b, c).sum(),
        argnums=(0, 1, 2),
    )(lw, mus, sig)
    for r, g in zip(g_ref, g_got):
        scale = np.abs(np.asarray(r)).max() + 1.0
        np.testing.assert_allclose(
            np.asarray(g) / scale, np.asarray(r) / scale, atol=2e-5
        )


def test_gmm_loglik_odd_sizes(pallas_interpret):
    # non-multiple-of-block sizes exercise padding/masking
    x, lw, mus, sig = _gmm_inputs(n=513, d=1, p=1, k=2, seed=3)
    ref = gmm_logprob.gmm_loglik_reference(x, lw, mus, sig)
    got = gmm_logprob.gmm_loglik(x, lw, mus, sig)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5)


def test_gmm_loglik_under_jit_and_value_grad(pallas_interpret):
    x, lw, mus, sig = _gmm_inputs(n=256, p=8)

    @jax.jit
    def f(a, b, c):
        return jnp.sum(gmm_logprob.gmm_loglik(x, a, b, c))

    v, g = jax.value_and_grad(f)(lw, mus, sig)
    v_ref = jnp.sum(gmm_logprob.gmm_loglik_reference(x, lw, mus, sig))
    np.testing.assert_allclose(float(v), float(v_ref), rtol=2e-5)
    assert jnp.isfinite(g).all()


def test_leapfrog_kernels_parity(pallas_interpret):
    c, d = 256, 128  # block-aligned so the Pallas path triggers
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (c, d))
    p = jax.random.normal(ks[1], (c, d))
    g = jax.random.normal(ks[2], (c, d))
    eps = jnp.full((c,), 0.05)
    minv = jnp.ones(d) * 1.3

    q_ref, p_ref = leapfrog.kick_drift_reference(
        q, p, g, eps[:, None], jnp.broadcast_to(minv, (c, d))
    )
    q_got, p_got = leapfrog.kick_drift(q, p, g, eps, minv)
    np.testing.assert_allclose(np.asarray(q_got), np.asarray(q_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_got), np.asarray(p_ref),
                               rtol=1e-5, atol=1e-6)

    p2_ref = leapfrog.kick_reference(p_ref, g, eps[:, None])
    p2_got = leapfrog.kick(p_got, g, eps)
    np.testing.assert_allclose(np.asarray(p2_got), np.asarray(p2_ref),
                               rtol=1e-5, atol=1e-6)


def test_leapfrog_fallback_on_unaligned():
    os.environ["BAYESIC_PALLAS"] = "interpret"
    try:
        q = jnp.ones((3, 5))
        p = jnp.ones((3, 5))
        g = jnp.ones((3, 5))
        qo, po = leapfrog.kick_drift(q, p, g, 0.1, jnp.ones(5))
        assert qo.shape == (3, 5)  # silently took the jnp fallback
    finally:
        os.environ.pop("BAYESIC_PALLAS", None)


def test_smc_with_batched_pallas_loglik(pallas_interpret):
    """End-to-end: GMM SMC with the fused kernel likelihood must match the
    vmap-of-replay likelihood (same seed => same tempering path)."""
    from bayesic_tpu.models import gmm

    cfg = gmm.Config(smoke=True)
    out_ref = gmm.run(cfg, use_pallas=False)
    out_pal = gmm.run(cfg, use_pallas=True)
    np.testing.assert_allclose(out_pal["log_evidence"],
                               out_ref["log_evidence"], rtol=1e-3, atol=0.2)
    assert out_pal["num_stages"] == out_ref["num_stages"]
    np.testing.assert_allclose(out_pal["pred_loglik"],
                               out_ref["pred_loglik"], rtol=1e-2)


def test_mxu_gather_parity():
    """One-hot MXU gather vs plain take (both precisions; CPU check of the
    math — on CPU dot_general is exact so both match tightly)."""
    from bayesic_tpu.ops.gather import gather_reference, mxu_gather

    t = jax.random.normal(jax.random.PRNGKey(0), (300, 16))
    idx = jax.random.randint(jax.random.PRNGKey(1), (512,), 0, 300)
    ref = gather_reference(t, idx)
    for prec, tol in [("high", 1e-4), ("fast", 3e-2)]:
        got = mxu_gather(t, idx, force=True, precision=prec)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=tol, atol=tol)
    # 1-D tables
    b = jax.random.normal(jax.random.PRNGKey(2), (300,))
    got = mxu_gather(b, idx, force=True, precision="high")
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(gather_reference(b, idx)),
                               rtol=1e-4, atol=1e-4)
    # grads flow to the right rows
    g = jax.grad(lambda tt: (mxu_gather(tt, idx, force=True) ** 2).sum())(t)
    g_ref = jax.grad(lambda tt: (gather_reference(tt, idx) ** 2).sum())(t)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=3e-2,
                               atol=3e-2)
