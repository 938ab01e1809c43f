"""Pallas kernel parity tests (SURVEY.md §4.7): every C14 kernel vs its
pure-jnp fallback, in interpreter mode on CPU (logic parity) — compiled-TPU
parity is exercised by bench/TPU runs."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesic_tpu.ops import gmm_logprob


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


def test_gmm_loglik_grad_fused_parity(pallas_interpret):
    """C14a fused value+gradient kernel vs jnp value_and_grad of the
    reference (lifted-feature formulation, one launch)."""
    x, lw, mus, sig = _gmm_inputs(n=777, d=2, p=300, k=3)

    ll, dlw, dmus, dsig = gmm_logprob.gmm_loglik_grad(x, lw, mus, sig)

    ll_ref = gmm_logprob.gmm_loglik_reference(x, lw, mus, sig)
    g_ref = jax.grad(
        lambda a, b, c: gmm_logprob.gmm_loglik_reference(x, a, b, c).sum(),
        argnums=(0, 1, 2),
    )(lw, mus, sig)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref),
                               rtol=3e-5, atol=3e-5)
    # gradients run a single bf16 MXU pass by design (surrogate-precision
    # gradient field; MH accept uses the f32-accurate value — see the
    # precision-split note in ops/gmm_logprob.py), so they carry ~4e-3
    # relative noise; values stay at f32 tolerance above
    for got, ref in zip((dlw, dmus, dsig), g_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=5e-3, atol=5e-3)


def test_smc_mutation_fused_path_matches_vjp():
    """SMC with batched_loglik_grad (C14a path) must track the generic
    vjp mutation path: same model, same key, near-identical particles."""
    from bayesic_tpu.infer.smc import SMC
    from bayesic_tpu.models import gmm

    cfg = gmm.Config(num_data=200, num_particles=256, mutation_steps=2,
                     leapfrog_steps=3)
    x, _ = gmm.make_data(cfg)
    model = gmm.make_model(cfg, x)

    plain = SMC(model, num_particles=cfg.num_particles,
                mutation_steps=cfg.mutation_steps,
                hmc_leapfrog_steps=cfg.leapfrog_steps)
    fused = SMC(model, num_particles=cfg.num_particles,
                mutation_steps=cfg.mutation_steps,
                hmc_leapfrog_steps=cfg.leapfrog_steps,
                batched_loglik=gmm.make_batched_loglik(
                    plain.info, plain._unravel, x),
                batched_loglik_grad=gmm.make_batched_loglik_grad(
                    plain.info, plain._unravel, plain._ravel, x))
    key = jax.random.PRNGKey(3)
    # deterministic check: the fused potential+gradient equals the generic
    # vjp one on the same particle batch (trajectory-level equality is not
    # meaningful — a single f32 accept-flip diverges the chaotic paths)
    q0 = plain._init_particles(key)
    beta = jnp.asarray(0.6)

    def vjp_pe_and_grad(qs):
        pe, vjp = jax.vjp(
            lambda z: -(plain._logprior(z) + beta * plain._loglik(z)), qs
        )
        return pe, vjp(jnp.ones_like(pe))[0]

    def fused_pe_and_grad(qs):
        lp, glp = fused._logprior_vg(qs)
        ll, gll = fused._loglik_vg(qs)
        return -(lp + beta * ll), -(glp + beta * gll)

    pe1, g1 = jax.jit(vjp_pe_and_grad)(q0)
    pe2, g2 = jax.jit(fused_pe_and_grad)(q0)
    np.testing.assert_allclose(np.asarray(pe2), np.asarray(pe1),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=2e-4, atol=2e-4)

    # statistical sanity: both full runs land on comparable evidence
    r1 = plain.run(key)
    r2 = fused.run(key)
    assert abs(float(r1.log_evidence) - float(r2.log_evidence)) < 15.0



def test_smc_with_batched_pallas_loglik(pallas_interpret):
    """End-to-end: GMM SMC with the fused kernel likelihood must match the
    vmap-of-replay likelihood (same seed => same tempering path).

    Pinned to the deterministic 'nudge' step adapter: the default
    dual-averaging adapter feeds acceptance statistics back into the step
    size continuously, so the last-ulp differences between the Pallas and
    jnp likelihoods get amplified into genuinely different trajectories —
    the tight tolerances here are only meaningful when the two runs follow
    the SAME tempering path."""
    from bayesic_tpu.models import gmm

    cfg = gmm.Config(smoke=True)
    kw = {"smc_kwargs": {"step_adapt": "nudge"}}
    out_ref = gmm.run(cfg, use_pallas=False, **kw)
    out_pal = gmm.run(cfg, use_pallas=True, **kw)
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
