"""Fused Pallas NUTS transition for the hierarchical-logistic workload
(SURVEY.md C14(a), BASELINE configs[1]; VERDICT r3 "what's weak" 4 — the
hier NUTS record was the last overhead-bound MCMC tier, flat for two
rounds at ~0.05% MFU).

Workload: benchmarks/harness.run_hier_logistic's full-batch CENTERED
hierarchical logistic regression — 128 chains over the 57-dim
unconstrained posterior (mu, log tau, theta[50], beta[5]) with a
10,000-observation Bernoulli likelihood.  The XLA path pays an HBM
round-trip of the whole vmapped while_loop carry per leapfrog leaf for
~1 GFLOP of math; this kernel runs the entire transition VMEM-resident,
reusing ``ops.fused_nuts._nuts_transition_core`` (the tree build is
potential-agnostic) with a hier-logistic lane-packed potential.

Lane layout
-----------
The chain state is one (C, 128) tile: lanes 0..dim-1 carry the flat
unconstrained vector in ``infer.svi.guides.unraveler`` site order
(mu, u_tau, theta[J], beta[F]; dim = 2 + J + F <= 128) and lanes
dim..127 are PAD DIMENSIONS.  Pads carry independent N(0, 1) auxiliary
latents, REDRAWN from N(0, 1) at every transition by the wrapper: the
redraw is an exact Gibbs move on the extended target
pi(q_real) x N(pad; 0, I), the NUTS transition leaves that extended
target invariant, and the returned state keeps only the real lanes — so
the marginal law of the real dims is exactly the model posterior.  Pads
join the leapfrog dynamics and multinomial weights like any other
dimension, but are MASKED OUT of the U-turn statistic (round 5: with
pads in the statistic the fresh auxiliary momenta dominated dq.v and
stretched trajectories ~1.5x past the real dims' turning point —
ess/draw 0.96 vs the XLA path's 1.52; any deterministic
reversal-symmetric termination rule is valid).

The likelihood rides one design matrix: A[n, 2+g(n)] = 1 and
A[n, 2+J+k] = x[n, k], so per-chain logits for ALL observations are a
single (C, 128) @ (128, Npad) MXU matmul and the likelihood gradient is
its transpose partner (C, Npad) @ (Npad, 128) — the one-hot group gather
becomes part of the matmul, the same trick as ops/gather.py.  Observation
rows are zero-padded to a multiple of 128 with weight 0.

Because pads are redrawn between transitions, the incoming ``states.pe``
/ ``states.grad`` are stale; the kernel recomputes both at the fresh
point (one extra potential eval per transition, amortized over the
2^K-leaf tree).

Parity tests: tests/test_fused_nuts_hier.py (potential/grad vs
build_logjoint's density + jax.grad, interpret-mode kernel vs core,
end-to-end posterior vs the XLA NUTS path).  Reference citation
impossible — /root/reference is empty (SURVEY.md section 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .fused_nuts import (_col_tile, _nuts_transition_core, _popcount8,  # noqa: F401
                         _rowsum_tile)

__all__ = ["build_design", "make_hier_potential",
           "fused_hier_nuts_transition", "make_batched_transition_hier"]

_LOG_2PI = float(np.log(2.0 * np.pi))


def build_design(x, y, group, num_groups):
    """(A, A^T, y_row, w_row) for the lane-packed likelihood.

    A is (Npad, 128): column 2+g(n) is the group-intercept indicator,
    columns 2+J..2+J+F-1 carry x[n]; all other columns (mu, u_tau, pads)
    are zero.  Rows are zero-padded to Npad = ceil(n/128)*128 with
    w_row = 0 so pad observations contribute nothing to density or grad.
    """
    x = np.asarray(x, np.float32)
    y = np.asarray(y, np.float32)
    group = np.asarray(group, np.int64)
    n, f = x.shape
    j = int(num_groups)
    dim = 2 + j + f
    assert dim <= 128, "hier fused kernel supports dim <= 128"
    npad = ((n + 127) // 128) * 128
    a = np.zeros((npad, 128), np.float32)
    a[np.arange(n), 2 + group] = 1.0
    a[:n, 2 + j:2 + j + f] = x
    y_row = np.zeros((1, npad), np.float32)
    y_row[0, :n] = y
    w_row = np.zeros((1, npad), np.float32)
    w_row[0, :n] = 1.0
    return (jnp.asarray(a), jnp.asarray(a.T.copy()),
            jnp.asarray(y_row), jnp.asarray(w_row))


def make_hier_potential(a, a_t, y_row, w_row, num_groups, num_features,
                        mm_dtype=jnp.float32):
    """pe(q) and grad(q) on the (C, 128) lane layout above; matches
    build_logjoint's unconstrained density of models/hier_logistic
    .make_model(centered=True) EXACTLY (constants included) on the real
    lanes, plus 0.5*||pad||^2 for the pad lanes — asserted in
    tests/test_fused_nuts_hier.py.  pe returns as a (C, 1) per-chain
    vector, grad as (C, 128)."""
    from .fused_nuts import _make_mms

    jj = int(num_groups)
    ff = int(num_features)
    dim = 2 + jj + ff
    # mm_dtype="split": f32-accurate value dots (3-pass hi/lo bf16),
    # single-pass bf16 gradient dots — see ops.fused_nuts._make_mms.
    # Per-chain scalars are (C, 1) vectors (round-5 convention — lane
    # slices and jnp.sum replace the old ones-matmul scalar tiles).
    val_mm, grad_mm = _make_mms(mm_dtype)
    # unconstrained density constants: mu ~ N(0, 5): log 5 + 0.5 log 2pi;
    # tau ~ HalfNormal(2) with exp transform: potential constant
    # -(0.5 log 2 - 0.5 log pi - log 2) = 0.5 log(2 pi); theta, beta
    # Normal constants
    const = (float(np.log(5.0)) + 0.5 * _LOG_2PI
             + 0.5 * _LOG_2PI
             + jj * 0.5 * _LOG_2PI
             + ff * 0.5 * _LOG_2PI)

    def pg(q):
        c = q.shape[0]
        lanes = lax.broadcasted_iota(jnp.int32, (c, 128), 1)
        m_theta = jnp.where(
            jnp.logical_and(lanes >= 2, lanes < 2 + jj), 1.0, 0.0)
        m_beta = jnp.where(
            jnp.logical_and(lanes >= 2 + jj, lanes < dim), 1.0, 0.0)
        m_pad = jnp.where(lanes >= dim, 1.0, 0.0)
        m_mu = jnp.where(lanes == 0, 1.0, 0.0)
        m_u = jnp.where(lanes == 1, 1.0, 0.0)

        # masked reductions, NOT lane slices: a sliced (C, 1) carries an
        # offset layout that cannot mix with reduction-derived (C, 1)s in
        # Mosaic ("Not implemented: Lane broadcast" — round-5 bisect)
        mu_t = jnp.sum(m_mu * q, axis=1, keepdims=True)   # (C, 1)
        u_t = jnp.sum(m_u * q, axis=1, keepdims=True)
        tau2 = jnp.exp(2.0 * u_t)
        inv_t2 = jnp.exp(-2.0 * u_t)
        dtheta = m_theta * (q - mu_t)
        s1 = jnp.sum(dtheta, axis=1, keepdims=True)
        s2 = jnp.sum(dtheta * dtheta, axis=1, keepdims=True)

        logits = val_mm(q, a_t)                           # (C, Npad)
        # stable softplus: max(l, 0) + log1p(exp(-|l|))
        sp = jnp.maximum(logits, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        terms = w_row * (sp - y_row * logits)
        lik = jnp.sum(terms, axis=1, keepdims=True)

        pe = (0.5 * (mu_t * mu_t) / 25.0
              + 0.125 * tau2 + (jj - 1.0) * u_t
              + 0.5 * s2 * inv_t2
              + 0.5 * jnp.sum((m_beta + m_pad) * q * q, axis=1,
                              keepdims=True)
              + lik + const)

        sig = jax.nn.sigmoid(logits)
        dpl = w_row * (sig - y_row)
        g_lik = grad_mm(dpl, a)                           # (C, 128)
        grad = (g_lik
                + dtheta * inv_t2
                + m_mu * (mu_t / 25.0 - s1 * inv_t2)
                + m_u * (0.25 * tau2 + (jj - 1.0) - s2 * inv_t2)
                + (m_beta + m_pad) * q)
        return pe, grad

    return pg


# ---------------------------------------------------------------------------
# Pallas wrapper
# ---------------------------------------------------------------------------

def _kernel(eps_ref, q_ref, mom_ref, sdir_ref, luacc_ref, luleaf_ref,
            invm_ref, a_ref, at_ref, y_ref, w_ref,
            qo_ref, peo_ref, go_ref, acc_ref, div_ref, depth_ref,
            steps_ref, h0_ref, *, num_groups, num_features, max_doublings,
            mm_dtype, divergence_threshold):
    pg = make_hier_potential(a_ref[...], at_ref[...], y_ref[...],
                             w_ref[...], num_groups, num_features,
                             mm_dtype=mm_dtype)
    q = q_ref[...]
    dim = 2 + num_groups + num_features
    # real-dims-only U-turn statistic (see _nuts_transition_core)
    turn_mask = jnp.where(
        lax.broadcasted_iota(jnp.int32, (1, q.shape[1]), 1) < dim,
        1.0, 0.0)
    pe0, g0 = pg(q)          # pads were redrawn outside: state is stale
    (q2, pe2, g2, acc, div, depth, nsteps, h0) = _nuts_transition_core(
        q, pe0, g0, mom_ref[...], sdir_ref[...], luacc_ref[...],
        luleaf_ref[...], eps_ref[0, 0], invm_ref[...], pg,
        max_doublings, divergence_threshold, turn_mask=turn_mask)
    qo_ref[...] = q2
    peo_ref[...] = pe2
    go_ref[...] = g2
    acc_ref[...] = acc
    div_ref[...] = div
    depth_ref[...] = depth
    steps_ref[...] = nsteps
    h0_ref[...] = h0


@functools.partial(
    jax.jit,
    static_argnames=("num_groups", "num_features", "block_chains",
                     "max_doublings", "mm_dtype", "divergence_threshold",
                     "interpret"))
def fused_hier_nuts_transition(q, mom, sign_dir, log_u_acc, log_u_leaf,
                               eps, inv_mass, a, a_t, y_row, w_row, *,
                               num_groups, num_features, block_chains=128,
                               max_doublings=6, mm_dtype="split",
                               divergence_threshold=1000.0,
                               interpret=False):
    """One fused NUTS transition over all chains of the hier-logistic
    posterior; grid over chain blocks.  q/mom: (N, 128) padded states;
    sign_dir (N, K) exact ±1; log_u_acc (N, K) / log_u_leaf (N, 2^K)
    strictly-negative log-uniforms; eps (1, 1); inv_mass (1, 128)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d_ = q.shape
    assert d_ == 128
    c = min(block_chains, n)
    assert n % c == 0
    kk = max_doublings
    mmd = mm_dtype if mm_dtype == "split" else jnp.dtype(mm_dtype)

    kernel = functools.partial(
        _kernel, num_groups=num_groups, num_features=num_features,
        max_doublings=kk, mm_dtype=mmd,
        divergence_threshold=divergence_threshold)

    vm = pltpu.VMEM
    blk = lambda w: pl.BlockSpec((c, w), lambda i: (i, 0),  # noqa: E731
                                 memory_space=vm)
    const = lambda ar: pl.BlockSpec(ar.shape, lambda i: (0,) * ar.ndim,  # noqa: E731,E501
                                    memory_space=vm)
    tile = jax.ShapeDtypeStruct((n, 1), jnp.float32)

    outs = pl.pallas_call(
        kernel,
        grid=(n // c,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            blk(d_), blk(d_), blk(kk), blk(kk), blk(1 << kk),
            const(inv_mass), const(a), const(a_t), const(y_row),
            const(w_row),
        ],
        out_specs=(blk(d_), blk(1), blk(d_), blk(1), blk(1),
                   blk(1), blk(1), blk(1)),
        out_shape=(jax.ShapeDtypeStruct((n, d_), jnp.float32), tile,
                   jax.ShapeDtypeStruct((n, d_), jnp.float32), tile, tile,
                   tile, tile, tile),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(eps, q, mom, sign_dir, log_u_acc, log_u_leaf, inv_mass,
      a, a_t, y_row, w_row)
    return outs


# ---------------------------------------------------------------------------
# MCMC integration
# ---------------------------------------------------------------------------

def make_batched_transition_hier(x, y, group, num_groups, num_features, *,
                                 max_doublings=6, block_chains=128,
                                 mm_dtype="split", interpret=False):
    """Build a ``batched_transition(key, states, step_size, inv_mass)``
    for MCMC over the centered hier-logistic model (requires
    ``shared_adapt=True``).  states.q is (n, dim) with dim = 2+J+F; the
    wrapper pads to 128 lanes with fresh N(0, 1) auxiliary draws each
    transition (see the module docstring for why that is exact)."""
    from ..infer.mcmc.integrators import IntegratorState
    from ..infer.mcmc.nuts import NUTSInfo

    a, a_t, y_row, w_row = build_design(x, y, group, num_groups)
    jj, ff = int(num_groups), int(num_features)
    dim = 2 + jj + ff
    kk = max_doublings

    def transition(key, states, step_size, inv_mass):
        n, d_ = states.q.shape
        assert d_ == dim
        k_m, k_d, k_a, k_l, k_p = jax.random.split(key, 5)
        q_full = jnp.concatenate(
            [states.q,
             jax.random.normal(k_p, (n, 128 - dim), jnp.float32)], axis=1)
        mom = jax.random.normal(k_m, (n, 128), jnp.float32)
        sign_dir = jnp.where(
            jax.random.bernoulli(k_d, 0.5, (n, kk)), 1.0, -1.0
        ).astype(jnp.float32)
        log_u_acc = jnp.log(jnp.maximum(
            jax.random.uniform(k_a, (n, kk), jnp.float32), 1e-38))
        log_u_leaf = jnp.log(jnp.maximum(
            jax.random.uniform(k_l, (n, 1 << kk), jnp.float32), 1e-38))
        invm_full = jnp.concatenate(
            [jnp.reshape(inv_mass, (1, dim)).astype(jnp.float32),
             jnp.ones((1, 128 - dim), jnp.float32)], axis=1)
        q2, pe2, g2, acc, div, depth, nsteps, h0 = fused_hier_nuts_transition(
            q_full, mom, sign_dir, log_u_acc, log_u_leaf,
            jnp.reshape(step_size, (1, 1)).astype(jnp.float32), invm_full,
            a, a_t, y_row, w_row, num_groups=jj, num_features=ff,
            block_chains=block_chains, max_doublings=kk, mm_dtype=mm_dtype,
            interpret=interpret)
        q_out = q2[:, :dim]
        new_states = IntegratorState(
            q_out, jnp.zeros_like(q_out), pe2[:, 0], g2[:, :dim])
        info = NUTSInfo(
            accept_prob=acc[:, 0],
            diverging=div[:, 0] > 0.5,
            depth=depth[:, 0].astype(jnp.int32),
            num_steps=nsteps[:, 0].astype(jnp.int32),
            energy=h0[:, 0],
            is_accepted=jnp.any(q_out != states.q, axis=-1),
        )
        return new_states, info

    return transition
