"""Fused Pallas NUTS transition for dense-MLP local posteriors (SURVEY.md
C14(a) — "fused leapfrog step … minimizing HBM round-trips for many vmapped
chains" — the last named Pallas obligation; VERDICT r3 item 2).

Workload: BASELINE configs[4]'s 1024-chain DLGM local-posterior NUTS —
per chain a D = nb*latent joint posterior over the latents z of ``nb`` data
rows under a FIXED tanh-MLP decoder:

    pe(z) = 0.5*||z||^2 + ||x - (tanh(z W1 + b1) W2 + b2)||^2 / (2 s^2) + C

Why a whole-transition kernel: the XLA path runs the iterative NUTS tree
as a vmapped while_loop whose carry (positions, momenta, endpoint states,
U-turn checkpoint buffers — ~60 MB across 1024 chains) lives in HBM, so
EVERY leapfrog leaf pays tens of MB of HBM round-trips for ~1 GFLOP of
math: measured 0.36% MFU, 2.8 ms/leaf (results_tpu_r3.json dlgm_nuts).
This kernel runs the ENTIRE transition (momentum refresh -> tree doubling
-> multinomial proposal) for a block of chains with every buffer
VMEM-resident; HBM is touched once per transition (read q/pe/grad +
pre-drawn randoms, write the new state).

Design notes
------------
* **One shared core.**  ``_nuts_transition_core`` is a pure-jnp function
  of arrays; the Pallas kernel body and the CPU/XLA reference path call
  the SAME function, so interpret-mode parity is exact by construction and
  the on-TPU selftest isolates Mosaic compilation only.
* **Randomness is an input — in log space.**  Momenta and the
  per-doubling / per-leaf uniforms are drawn OUTSIDE the kernel
  (jax.random) and passed in: parity is bit-exact, and the kernel stays
  a deterministic function.  Uniforms enter as ``log(u)`` (and the
  doubling directions as exact ±1 signs), NOT as raw u: per-chain
  scalars ride through ones-matmul lane replication (see the
  scalar-tile convention), and TPU matmuls run at reduced input
  precision — a raw u ∈ (1-2⁻⁹, 1) rounds to exactly 1.0, making
  ``log u < 0`` false and silently skipping the multinomial's
  guaranteed first-leaf take (state corruption: the proposal tuple's
  pe sentinel leaks).  log-space values near 0⁻ survive any mantissa
  truncation with their sign intact.  A belt-and-braces guard also
  forces the first evaluated leaf of every subtree into the proposal
  (restoring the invariant independent of arithmetic).
* **Lane-packed decoder.**  Mosaic cannot reshape across the sublane/lane
  boundary, so the (C, D) chain state is never reshaped to (C*nb, latent).
  Instead R = 128//latent data rows are packed per 128-lane group and the
  decoder weights are expanded to R-fold block-diagonal form:
  W1p (128, R*hidden), W2p (R*hidden, R*data).  The only layout moves are
  lane-slices concatenated along sublanes (legal in Mosaic), and every
  matmul has lane width >= 128.
* **Lockstep tree with masks.**  All chains in a block share the loop
  counters (the same semantics the vmapped XLA while_loop has); per-chain
  early termination is a mask.  The O(max_depth) checkpoint U-turn scheme
  of infer/mcmc/nuts.py is reproduced verbatim — slots indexed by
  popcount of the SHARED leaf counter, so slot arithmetic is scalar.
* **Validity under masked lockstep + surrogate-precision gradients.**
  Leapfrog with any fixed gradient field is volume-preserving and
  reversible; the multinomial weights use the exactly-computed potential,
  so an optional bf16 matmul path changes trajectory quality, not the
  invariant distribution.

The transition drops into the existing ``MCMC`` driver through its
``batched_transition`` hook (infer/mcmc/mcmc.py), so warmup windows,
pooled dual averaging, Welford mass adaptation, segmented runs and
diagnostics are all reused unchanged.  Parity tests:
tests/test_fused_nuts.py; on-TPU gate: benchmarks/selftest.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["pack_decoder", "pack_x", "make_packed_potential",
           "fused_nuts_transition", "make_batched_transition"]

_LOG_2PI = float(np.log(2.0 * np.pi))


# ---------------------------------------------------------------------------
# packing: decoder weights -> R-fold block-diagonal lane-packed matrices
# ---------------------------------------------------------------------------

def pack_decoder(dec_params, latent_dim, hidden, data_dim):
    """Expand the flax decoder params into lane-packed block-diagonal
    matmul operands.  R = 128 // latent_dim rows are packed per 128-lane
    group; latent_dim must divide 128."""
    assert 128 % latent_dim == 0, "latent_dim must divide 128"
    r = 128 // latent_dim
    p = dec_params["params"]
    w1 = np.asarray(p["Dense_0"]["kernel"], np.float32)   # (latent, hidden)
    b1 = np.asarray(p["Dense_0"]["bias"], np.float32)     # (hidden,)
    w2 = np.asarray(p["Dense_1"]["kernel"], np.float32)   # (hidden, data)
    b2 = np.asarray(p["Dense_1"]["bias"], np.float32)     # (data,)

    w1p = np.zeros((r * latent_dim, r * hidden), np.float32)
    w2p = np.zeros((r * hidden, r * data_dim), np.float32)
    for i in range(r):
        w1p[i * latent_dim:(i + 1) * latent_dim,
            i * hidden:(i + 1) * hidden] = w1
        w2p[i * hidden:(i + 1) * hidden,
            i * data_dim:(i + 1) * data_dim] = w2
    b1p = np.tile(b1, r)[None, :]                          # (1, r*hidden)
    b2p = np.tile(b2, r)[None, :]                          # (1, r*data)
    return (jnp.asarray(w1p), jnp.asarray(w2p),
            jnp.asarray(w1p.T.copy()), jnp.asarray(w2p.T.copy()),
            jnp.asarray(b1p), jnp.asarray(b2p))


def pack_x(x_batch, latent_dim, block_chains):
    """Pack the (nb, data_dim) observation batch to match the lane-packed
    decoder output, replicated for a block of C chains in (group, chain)
    row order: row g*C + c carries rows 16g..16g+R-1 of x."""
    nb, data_dim = x_batch.shape
    r = 128 // latent_dim
    assert nb % r == 0, "nb must be a multiple of 128 // latent_dim"
    g = nb // r
    xp = np.asarray(x_batch, np.float32).reshape(g, r * data_dim)
    x_rep = np.repeat(xp, block_chains, axis=0)            # (g*C, r*data)
    return jnp.asarray(x_rep)


# ---------------------------------------------------------------------------
# per-chain scalar convention (round 5: (C, 1) vectors, with layout rules)
# ---------------------------------------------------------------------------
# Per-chain scalars are (C, 1) VECTORS: reductions via jnp.sum(axis=1,
# keepdims=True), column picks via masked reductions, and (C, 1) -> (C, D)
# via ordinary broadcasting — all VPU ops.  (Rounds 1-4 used (C, 128)
# "scalar tiles" fed by ones-matmuls because (C, 1) lane broadcast was
# thought unsupported; those small MXU calls measured ~17 of the ~21 us
# per-leaf wall, and the ones-matmuls themselves truncated to bf16 at
# DEFAULT precision — the round-5 hier lockup.)
# Mosaic (C, 1) LAYOUT RULES, established by bisection (_hier_probe*,
# /tmp lane-broadcast probes, 2026-08-20):
#   * (C, 1)s DERIVED FROM REDUCTIONS mix freely in arithmetic, loop
#     carries, nested while_loops, and broadcasts against (C, D);
#   * a (C, 1) from a LANE SLICE (q[:, 0:1]) or a VMEM BLOCK LOAD carries
#     an offset layout that CANNOT mix with reduction-derived (C, 1)s
#     ("Not implemented: Lane broadcast") — canonicalize through a masked
#     reduction (or recompute instead of loading);
#   * a (C, 1) CONSTANT (jnp.zeros) gets a replicated layout that a
#     while_loop carry cannot reconcile with reduction outputs ("Invalid
#     relayout") — derive zeros from a reduction (jnp.sum(q * 0, ...)).
# The legacy tile helpers below are kept for reference/compat.

def _rowsum_tile(x, ones_128):
    """(M, L) -> (M, 128) tile whose every lane holds the row sum.
    L must be a multiple of 128.

    The ones-matmul must NOT run at Mosaic's DEFAULT precision: DEFAULT
    truncates the f32 inputs to bf16, so summing 128 per-lane partials of
    magnitude ~60 (the hier 10k-obs likelihood) injects ~N(0, 1.3) noise
    into EVERY potential/kinetic-energy evaluation (measured on TPU,
    benchmarks/_hier_probe5.py).  That noise caps the MH/multinomial
    accept statistic at ~0.5-0.85 at ANY step size, and shared dual
    averaging then chases the unreachable target into an eps -> 0 lockup
    (the round-5 hier bench failure, R-hat 36).  The fix is a 2-pass
    hi/lo split: part == part_hi + part_lo EXACTLY in f32, the ones
    operand is bf16-exact, and bf16 x bf16 products accumulate in f32 on
    the MXU — so two DEFAULT passes reproduce the f32 row sum up to f32
    accumulation order (measured dev sd 6e-4), at 1/3 the cost of the
    6-pass HIGHEST emulation."""
    m, el = x.shape
    part = x[:, 0:128]
    for g in range(1, el // 128):
        part = part + x[:, g * 128:(g + 1) * 128]
    hi = part.astype(jnp.bfloat16)
    lo = (part - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    ones_bf = ones_128.astype(jnp.bfloat16)
    dot = functools.partial(lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return dot(hi, ones_bf) + dot(lo, ones_bf)


def _col_tile(mat, j, ones_k):
    """(C, K), scalar j -> (C, 128) tile of column j, lane-replicated.
    ``ones_k`` is a ones matrix of shape (K, 128).  Same 2-pass hi/lo
    split as _rowsum_tile: a DEFAULT dot would truncate the picked value
    to bf16 — log-uniforms and ±1 signs survive truncation in SIGN (the
    log-space convention), but exact values keep the kernel bit-faithful
    to the jnp core."""
    lanes = lax.broadcasted_iota(jnp.int32, mat.shape, 1)
    sel = jnp.where(lanes == j, mat, 0.0)
    hi = sel.astype(jnp.bfloat16)
    lo = (sel - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    ones_bf = ones_k.astype(jnp.bfloat16)
    dot = functools.partial(lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return dot(hi, ones_bf) + dot(lo, ones_bf)


def _widen(tile, n_chunks):
    """(C, 128) tile -> (C, 128*n_chunks) by lane concatenation."""
    if n_chunks == 1:
        return tile
    return jnp.concatenate([tile] * n_chunks, 1)


# ---------------------------------------------------------------------------
# lane-packed potential + gradient (pure jnp: runs in-kernel and outside)
# ---------------------------------------------------------------------------

_NT = (((1,), (0,)), ((), ()))


def _dot_3x(a, b):
    """f32-accurate dot via 3 single-pass bf16 MXU products (the GMM
    mutation kernel's value-dot split, ops/gmm_logprob.py):
    a·b = hi_a·hi_b + hi_a·lo_b + lo_a·hi_b (+ O(2^-16 rel) dropped).
    Mosaic lowers only DEFAULT (1-pass bf16) and HIGHEST (6-pass f32
    emulation); this is ~f32 accuracy at half HIGHEST's MXU passes."""
    a_hi = a.astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = functools.partial(lax.dot_general, dimension_numbers=_NT,
                            preferred_element_type=jnp.float32)
    return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)


def _make_mms(mm_dtype):
    """(value_mm, grad_mm) for a potential's forward/backward dots.

    mm_dtype == "split" selects the GMM-proven precision split (VERDICT
    r4 item 4): VALUE dots via the 3-pass hi/lo bf16 split (pe enters
    the multinomial weights and MH ratios, so it needs ~f32 accuracy);
    GRADIENT dots as ONE bf16 pass — leapfrog with ANY fixed gradient
    field is volume-preserving and reversible, and the acceptance
    weights use the exactly-computed potential, so gradient precision
    changes trajectory quality only, never the invariant distribution
    (module docstring; same argument as ops/gmm_logprob.py).
    Any other mm_dtype keeps the original single-dtype behavior."""
    if mm_dtype == "split":
        grad_mm = lambda a, b: lax.dot_general(  # noqa: E731
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), _NT,
            preferred_element_type=jnp.float32)
        return _dot_3x, grad_mm
    dt = jnp.dtype(mm_dtype)
    # f32 must mean REAL f32: Mosaic's DEFAULT dot truncates f32 inputs
    # to bf16 (single pass), which at the hier shape puts O(0.2) noise
    # on the 10k-term likelihood — on top of the _rowsum_tile issue
    # (see its docstring).  HIGHEST = 6-pass f32 emulation.
    prec = lax.Precision.HIGHEST if dt == jnp.float32 else None
    mm = lambda a, b: lax.dot_general(  # noqa: E731
        a.astype(dt), b.astype(dt), _NT,
        preferred_element_type=jnp.float32, precision=prec)
    return mm, mm


def make_packed_potential(w1p, w2p, w1pt, w2pt, b1p, b2p, x_rep, sigma,
                          n_groups, block_chains, nb, latent_dim, data_dim,
                          mm_dtype=jnp.float32):
    """pe(q) and grad(q) for the packed decoder; q is (C, D) with
    D = n_groups*128.  Matches models/dlgm.local_posterior_mcmc's model
    log-density exactly (incl. normalization constants) — asserted in
    tests/test_fused_nuts.py.  pe comes back as a (C, 1) per-chain
    vector (round-5 convention: lane reductions via jnp.sum and (C, 1)
    broadcasts are VPU ops; the old ones-matmul scalar tiles cost one
    MXU call each and dominated the per-leaf wall — ~17 of 21 µs).
    mm_dtype="split" selects the value/gradient precision split
    (_make_mms)."""
    inv_s2 = 1.0 / float(sigma * sigma)
    const = (0.5 * _LOG_2PI * (nb * latent_dim + nb * data_dim)
             + nb * data_dim * float(np.log(sigma)))
    c = block_chains
    val_mm, grad_mm = _make_mms(mm_dtype)

    def pg(q):
        # (C, D) -> (G*C, 128) by lane-slice + sublane-concat (g, c) order
        z4 = jnp.concatenate(
            [q[:, g * 128:(g + 1) * 128] for g in range(n_groups)], 0)
        h = val_mm(z4, w1p) + b1p
        a = jnp.tanh(h)
        mu = val_mm(a, w2p) + b2p
        res = mu - x_rep
        sq = jnp.sum(res * res, axis=1, keepdims=True)     # (G*C, 1)
        sq_c = sq[0:c]
        for g in range(1, n_groups):
            sq_c = sq_c + sq[g * c:(g + 1) * c]            # (C, 1)
        pe = (0.5 * jnp.sum(q * q, axis=1, keepdims=True)
              + (0.5 * inv_s2) * sq_c + const)
        # canonicalize to the reduction layout: the sublane-sliced sq_c
        # parts leave pe with a layout Mosaic cannot mix with other
        # (C, 1) reductions inside the transition loops (round-5 bisect,
        # "Not implemented: Lane broadcast"); the single-lane re-reduce
        # is numerically a no-op
        pe = jnp.sum(pe, axis=1, keepdims=True)
        dmu = res * inv_s2
        da = grad_mm(dmu, w2pt) * (1.0 - a * a)
        dz4 = grad_mm(da, w1pt)                            # (G*C, 128)
        dz = jnp.concatenate(
            [dz4[g * c:(g + 1) * c] for g in range(n_groups)], 1)
        return pe, q + dz

    return pg


# ---------------------------------------------------------------------------
# scalar bit helpers (Mosaic has no scalar popcount lowering)
# ---------------------------------------------------------------------------

def _popcount8(i):
    """Popcount of a small (< 2**12) non-negative int32 scalar.  12 bits
    covers leaf counters up to max_doublings=11 (the round-5 hier kernel
    runs 10 doublings to match the XLA path's max_tree_depth; the
    original 8-bit loop silently truncated at kk >= 9)."""
    out = i & 1
    for s in range(1, 12):
        out = out + ((i >> s) & 1)
    return out


# ---------------------------------------------------------------------------
# the shared transition core
# ---------------------------------------------------------------------------

def _nuts_transition_core(q, pe, grad, mom, sign_dir, log_u_acc,
                          log_u_leaf, eps, inv_mass, pg, max_doublings,
                          divergence_threshold=1000.0, turn_mask=None):
    """One multinomial-NUTS transition for a block of C chains, lockstep
    with per-chain masks.  Mirrors infer/mcmc/nuts.py's iterative tree +
    checkpoint U-turn scheme (same slot addressing, same merge rule).

    Shapes: q/grad/mom (C, D); pe (C, 1) per-chain potential — a wider
    (C, W) input is accepted and sliced to its first lane; sign_dir
    (C, K) of ±1 doubling directions; log_u_acc (C, K) and log_u_leaf
    (C, 2**K) log-uniforms (strictly negative — see the module
    docstring on why randomness enters in log space); eps scalar;
    inv_mass (1, D).  Returns (q', pe', grad', accept_stat, diverging,
    depth, num_steps, h0) with per-chain scalars as (C, 1) vectors
    (f32; diverging as 0/1, depth and num_steps as counts).

    Round-5 note: per-chain scalars are (C, 1) VECTORS internally.  The
    original scalar-tile convention routed every reduction and column
    pick through a ones-MATMUL because early Mosaic could not
    lane-broadcast (C, 1) values; current Mosaic handles (C, 1)
    broadcasts (the gmm mutation kernel relies on them), and the tile
    convention's many small MXU calls measured ~17 of the ~21 µs
    per-leaf wall.  The potential ``pg`` likewise returns pe as (C, 1).
    """
    kk = max_doublings
    cdim, d_ = q.shape
    f32 = q.dtype
    # canonicalize pe to the REDUCTION layout: a lane-slice or block-load
    # (C, 1) carries an offset layout that Mosaic cannot mix with
    # reduction-derived (C, 1)s ("Not implemented: Lane broadcast" at the
    # first add); reducing over the single lane is a no-op numerically
    # but pins the layout (measured bisect: benchmarks round 5)
    pe = jnp.sum(pe[:, 0:1], axis=1, keepdims=True)

    def rsum(x):
        return jnp.sum(x, axis=1, keepdims=True)           # (C, 1)

    def _col1(mat, j):
        lanes = lax.broadcasted_iota(jnp.int32, mat.shape, 1)
        return jnp.sum(jnp.where(lanes == j, mat, 0.0), axis=1,
                       keepdims=True)                      # (C, 1)

    def sel(mask, a, b):
        """Select on (C, D) data arrays by a (C, 1) 0/1 mask."""
        return jnp.where(mask > 0.5, a, b)

    p0 = mom * lax.rsqrt(inv_mass)
    h0 = pe + 0.5 * rsum(p0 * p0 * inv_mass)
    # derive the zero CONCRETELY from a reduction: a jnp.zeros constant
    # gets a replicated vector layout in Mosaic, and the while_loop carry
    # then demands an unsupported concrete->replicated relayout of the
    # body's reduction outputs ("Invalid relayout ... replicated in
    # destination but not in source")
    zero_t = jnp.sum(q * 0.0, axis=1, keepdims=True)       # (C, 1)
    one_t = zero_t + 1.0
    neg_inf_t = zero_t - jnp.inf

    def is_turning(q_l, v_l, q_r, v_r, sign_w):
        # turn_mask (1, D) restricts the U-turn statistic to REAL
        # dimensions: auxiliary pad lanes (fresh N(0, 1) each transition,
        # hier kernel) otherwise dominate dq.v and stretch trajectories
        # far past the real dims' turning point (measured round 5:
        # ess/draw 0.96 with pads in the statistic vs 1.52 on the XLA
        # path; mean tree steps 10.2 vs 7).  Any deterministic,
        # reversal-symmetric termination rule keeps NUTS valid — masking
        # is such a rule.
        dq = (q_r - q_l) * sign_w
        if turn_mask is not None:
            dq = dq * turn_mask
        return jnp.minimum(rsum(dq * v_l), rsum(dq * v_r)) < 0.0

    # all per-chain flags are 0/1 f32 tiles; AND = *, OR = maximum,
    # NOT = 1 - x — keeps every op elementwise on ordinary layouts
    def f_and(a, b):
        return a * b

    def f_or(a, b):
        return jnp.maximum(a, b)

    def f_not(a):
        return 1.0 - a

    def b2f(cond):
        return jnp.where(cond, 1.0, 0.0)

    # outer carry: trajectory state, batched over chains
    init = (jnp.zeros((), jnp.int32),
            (q, p0, grad), (q, p0, grad),
            (q, pe, grad),
            zero_t,                       # log weight (root leaf: exp(0))
            zero_t, zero_t,               # sum_accept, num_leaves
            zero_t,                       # num_steps
            zero_t, zero_t,               # turning, diverging (0/1)
            zero_t)                       # depth

    def outer_cond(carry):
        dstep = carry[0]
        turning, diverging = carry[8], carry[9]
        alive = f_and(f_not(turning), f_not(diverging))
        return jnp.logical_and(dstep < kk, jnp.max(alive) > 0.5)

    def outer_body(carry):
        (dstep, left, right, prop, log_w, sum_acc, n_leaves, n_steps,
         turning, diverging, depth) = carry
        traj_active = f_and(f_not(turning), f_not(diverging))
        # sign_dir carries exact ±1 values
        go_right = b2f(_col1(sign_dir, dstep) > 0.0)
        sign_w = 2.0 * go_right - 1.0                           # (C, 1)
        eps_w = sign_w * eps

        edge = tuple(sel(go_right, r, l) for r, l in zip(right, left))
        n_sub = jnp.left_shift(jnp.asarray(1, jnp.int32), dstep)
        leaf_base = n_sub - 1

        # ---- build one subtree of up to n_sub leaves (lockstep) --------
        # checkpoints ride as K static (C, D) arrays — the slot index is a
        # shared scalar, so masked per-slot selects are legal and cheap
        zeros_cd = q * 0.0
        sub_init = (jnp.zeros((), jnp.int32), edge,
                    (edge[0], zero_t, edge[2]),          # prop (pe unused)
                    neg_inf_t,                           # subtree log w
                    zero_t,                              # subtree sum acc
                    zero_t,                              # per-chain leaves
                    zero_t, zero_t,                      # turning, diverging
                    (zeros_cd,) * kk,                    # q checkpoints
                    (zeros_cd,) * kk)                    # v checkpoints

        def sub_cond(sc):
            i, s_turn, s_div = sc[0], sc[6], sc[7]
            active = f_and(traj_active,
                           f_and(f_not(s_turn), f_not(s_div)))
            return jnp.logical_and(i < n_sub, jnp.max(active) > 0.5)

        def sub_body(sc):
            (i, st, sprop, s_logw, s_acc, s_cnt, s_turn, s_div,
             ck_q, ck_v) = sc
            m = f_and(traj_active, f_and(f_not(s_turn), f_not(s_div)))
            st_q, st_p, st_g = st

            # leapfrog (per-chain signed step)
            p_half = st_p - (0.5 * eps_w) * st_g
            q_new = st_q + eps_w * (inv_mass * p_half)
            pe_new, g_new = pg(q_new)
            p_new = p_half - (0.5 * eps_w) * g_new
            ke = 0.5 * rsum(p_new * p_new * inv_mass)
            delta = pe_new + ke - h0
            delta = jnp.where(jnp.isnan(delta), jnp.inf, delta)
            div_new = b2f(delta > divergence_threshold)
            leaf_logw = -delta
            new_logw = jnp.logaddexp(s_logw, leaf_logw)

            # fresh == 1 until the subtree holds its first evaluated
            # leaf: that leaf is taken UNCONDITIONALLY (its conditional
            # multinomial probability is exp(0) = 1), so the proposal
            # tuple's pe sentinel can never reach a merge.  The guard is
            # load-bearing: the log-u comparison below is exact math,
            # but a reduced-precision lane replication or a diverged
            # first leaf (rhs = -inf - -inf = NaN) must not skip it.
            fresh = b2f(s_logw < -1e37)
            log_u = _col1(log_u_leaf, leaf_base + i)
            take = f_and(m, f_or(fresh,
                                 b2f(log_u < leaf_logw - new_logw)))
            p_q = sel(take, q_new, sprop[0])
            p_pe = jnp.where(take > 0.5, pe_new, sprop[1])
            p_g = sel(take, g_new, sprop[2])
            s_acc2 = s_acc + m * jnp.minimum(one_t, jnp.exp(-delta))

            v_new = inv_mass * p_new
            # even leaf: checkpoint at slot popcount(i) (shared scalar) —
            # per-slot masked selects, no dynamic indexing
            slot = _popcount8(i)
            is_even = (i & 1) == 0
            store = m * b2f(is_even)
            ck_q = tuple(
                sel(store * b2f(slot == s_), q_new, cq)
                for s_, cq in enumerate(ck_q))
            ck_v = tuple(
                sel(store * b2f(slot == s_), v_new, cv)
                for s_, cv in enumerate(ck_v))

            # odd leaf: U-turn checks against open checkpoint slots
            t_ones = _popcount8(jnp.bitwise_xor(i, i + 1)) - 1
            idx_max = _popcount8(i) - 1
            idx_min = idx_max - t_ones + 1

            turn_acc = zero_t
            for s_ in range(kk):
                in_rng = jnp.logical_and(s_ >= idx_min, s_ <= idx_max)
                turn_s = b2f(is_turning(ck_q[s_], ck_v[s_], q_new, v_new,
                                        sign_w))
                turn_acc = f_or(turn_acc, b2f(in_rng) * turn_s)
            turn_acc = turn_acc * b2f(jnp.logical_not(is_even))

            st2 = (sel(m, q_new, st_q), sel(m, p_new, st_p),
                   sel(m, g_new, st_g))
            return (i + 1, st2, (p_q, p_pe, p_g),
                    jnp.where(m > 0.5, new_logw, s_logw),
                    s_acc2,
                    s_cnt + m,
                    f_or(s_turn, f_and(m, turn_acc)),
                    f_or(s_div, f_and(m, div_new)),
                    ck_q, ck_v)

        sub = lax.while_loop(sub_cond, sub_body, sub_init)
        (_, s_st, s_prop, s_logw, s_acc, s_cnt, s_turn, s_div,
         _, _) = sub

        bad = f_or(s_turn, s_div)
        ok = f_and(traj_active, f_not(bad))

        # biased progressive merge of the subtree proposal, compared in
        # log space (log u' < min(0, s_logw - log_w) ⟺ u' < accept_p;
        # log-uniforms survive lane replication sign-intact)
        log_acc = jnp.minimum(zero_t, s_logw - log_w)
        take2 = f_and(ok, b2f(
            _col1(log_u_acc, dstep) < log_acc))
        prop2 = (sel(take2, s_prop[0], prop[0]),
                 jnp.where(take2 > 0.5, s_prop[1], prop[1]),
                 sel(take2, s_prop[2], prop[2]))
        log_w2 = jnp.where(ok > 0.5, jnp.logaddexp(log_w, s_logw), log_w)

        upd_r = f_and(ok, go_right)
        upd_l = f_and(ok, f_not(go_right))
        right2 = tuple(sel(upd_r, n, o) for n, o in zip(s_st, right))
        left2 = tuple(sel(upd_l, n, o) for n, o in zip(s_st, left))

        full_turn = b2f(is_turning(
            left2[0], inv_mass * left2[1],
            right2[0], inv_mass * right2[1], 1.0))
        turning2 = f_or(
            turning,
            f_and(traj_active, f_or(s_turn, f_and(f_not(bad), full_turn))))
        diverging2 = f_or(diverging, f_and(traj_active, s_div))

        return (dstep + 1, left2, right2, prop2, log_w2,
                sum_acc + traj_active * s_acc,
                n_leaves + traj_active * s_cnt,
                n_steps + traj_active * s_cnt,
                turning2, diverging2,
                depth + traj_active)

    out = lax.while_loop(outer_cond, outer_body, init)
    (_, _, _, prop, _, sum_acc, n_leaves, n_steps, _, diverging,
     depth) = out
    accept_stat = sum_acc / jnp.maximum(n_leaves, 1.0)
    return (prop[0], prop[1], prop[2], accept_stat,
            diverging, depth, n_steps, h0)


# ---------------------------------------------------------------------------
# Pallas wrapper: grid over chain blocks, everything VMEM-resident
# ---------------------------------------------------------------------------

def _kernel(eps_ref, q_ref, pe_ref, g_ref, mom_ref, sdir_ref, luacc_ref,
            luleaf_ref, invm_ref, w1_ref, w2_ref, w1t_ref, w2t_ref,
            b1_ref, b2_ref, x_ref,
            qo_ref, peo_ref, go_ref, acc_ref, div_ref, depth_ref,
            steps_ref, h0_ref, *, sigma, n_groups, block_chains, nb,
            latent_dim, data_dim, max_doublings, mm_dtype,
            divergence_threshold, recompute_pe):
    pg = make_packed_potential(
        w1_ref[...], w2_ref[...], w1t_ref[...], w2t_ref[...],
        b1_ref[...], b2_ref[...], x_ref[...], sigma, n_groups,
        block_chains, nb, latent_dim, data_dim, mm_dtype=mm_dtype)
    # Mosaic mode recomputes pe/grad at the incoming point instead of
    # loading them: a (C, 1) VMEM block load carries a layout Mosaic
    # cannot mix with the core's reduction-derived (C, 1) scalars ("Not
    # implemented: Lane broadcast" — round-5 bisect); one extra potential
    # evaluation per transition amortizes over the tree's 2^K leaves,
    # mirroring the hier kernel.  Interpret mode keeps the passed pe/grad
    # (numerically the same pg(q)) so the interpret-vs-core parity test
    # stays bit-exact.
    q0 = q_ref[...]
    if recompute_pe:
        pe0, g0 = pg(q0)
    else:
        pe0, g0 = pe_ref[...], g_ref[...]
    (q2, pe2, g2, acc, div, depth, nsteps, h0) = _nuts_transition_core(
        q0, pe0, g0, mom_ref[...], sdir_ref[...],
        luacc_ref[...], luleaf_ref[...], eps_ref[0, 0], invm_ref[...], pg,
        max_doublings, divergence_threshold)
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
    static_argnames=("sigma", "n_groups", "block_chains", "nb",
                     "latent_dim", "data_dim", "max_doublings", "mm_dtype",
                     "divergence_threshold", "interpret"))
def fused_nuts_transition(q, pe, grad, mom, sign_dir, log_u_acc,
                          log_u_leaf, eps,
                          inv_mass, w1p, w2p, w1pt, w2pt, b1p, b2p, x_rep,
                          *, sigma, n_groups, block_chains, nb, latent_dim,
                          data_dim, max_doublings=6, mm_dtype="split",
                          divergence_threshold=1000.0, interpret=False):
    """One fused NUTS transition over all chains; grid over chain blocks.

    q/grad/mom: (N, D); pe: (N, 1) per-chain potential; sign_dir:
    (N, K) of ±1; log_u_acc: (N, K) and log_u_leaf: (N, 2**K)
    strictly-negative log-uniforms; eps: (1, 1) traced; inv_mass:
    (1, D).  Per-chain outputs come back as (N, 1) vectors.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d_ = q.shape
    c = block_chains
    assert n % c == 0
    kk = max_doublings
    mmd = mm_dtype if mm_dtype == "split" else jnp.dtype(mm_dtype)

    kernel = functools.partial(
        _kernel, sigma=sigma, n_groups=n_groups, block_chains=c, nb=nb,
        latent_dim=latent_dim, data_dim=data_dim, max_doublings=kk,
        mm_dtype=mmd, divergence_threshold=divergence_threshold,
        recompute_pe=not interpret)

    vm = pltpu.VMEM
    blk = lambda w: pl.BlockSpec((c, w), lambda i: (i, 0),  # noqa: E731
                                 memory_space=vm)
    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,  # noqa: E731,E501
                                   memory_space=vm)
    tile = jax.ShapeDtypeStruct((n, 1), jnp.float32)

    outs = pl.pallas_call(
        kernel,
        grid=(n // c,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            blk(d_), blk(1), blk(d_), blk(d_),
            blk(kk), blk(kk), blk(1 << kk),
            const(inv_mass), const(w1p), const(w2p), const(w1pt),
            const(w2pt), const(b1p), const(b2p), const(x_rep),
        ],
        out_specs=(blk(d_), blk(1), blk(d_), blk(1), blk(1),
                   blk(1), blk(1), blk(1)),
        out_shape=(jax.ShapeDtypeStruct((n, d_), jnp.float32), tile,
                   jax.ShapeDtypeStruct((n, d_), jnp.float32), tile, tile,
                   tile, tile, tile),
        # the default 16 MB scoped-VMEM cap is dominated here by the
        # C-independent packed weights + spill stack (16.3 MB at C=32,
        # 17.1 MB at C=64 for the configs[4] shape); v5e has 128 MB VMEM,
        # so raise the cap instead of shrinking blocks
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(eps, q, pe, grad, mom, sign_dir, log_u_acc, log_u_leaf, inv_mass,
      w1p, w2p, w1pt, w2pt, b1p, b2p, x_rep)
    return outs


# ---------------------------------------------------------------------------
# MCMC integration: a batched_transition for infer/mcmc/mcmc.py
# ---------------------------------------------------------------------------

def make_batched_transition(dec_params, sigma_x, x_batch, *, latent_dim,
                            hidden, max_doublings=6, block_chains=64,
                            mm_dtype="split", interpret=False):
    """Build a ``batched_transition(key, states, step_size, inv_mass)``
    for MCMC over the DLGM local posterior (models/dlgm.py
    local_posterior_mcmc's model) running the fused Pallas transition.

    Requires ``shared_adapt=True`` (scalar step size / shared mass).

    mm_dtype defaults to "split" (round 5): it is both the statistically
    right choice (exact 3-pass value dots feed the multinomial/MH
    weights) AND the only one that compiles at the bench shape on
    hardware — "float32" (HIGHEST-precision 6-pass dots) pushes the
    XLA-side scoped-VMEM stack for the pallas-call fusion to ~20.9 MB
    against XLA's fixed 16 MB scoped limit, which the Mosaic
    ``vmem_limit_bytes`` raise does NOT govern (probe:
    benchmarks/_nuts_probe2b.py, 2026-08-20).  The same scoped limit
    caps block_chains at 64 under "split" (128 needs 18.9 MB)."""
    from ..infer.mcmc.integrators import IntegratorState
    from ..infer.mcmc.nuts import NUTSInfo

    nb, data_dim = x_batch.shape
    sigma = float(sigma_x)
    w1p, w2p, w1pt, w2pt, b1p, b2p = pack_decoder(
        dec_params, latent_dim, hidden, data_dim)
    x_rep = pack_x(x_batch, latent_dim, block_chains)
    r = 128 // latent_dim
    n_groups = nb // r
    kk = max_doublings

    def transition(key, states, step_size, inv_mass):
        n, d_ = states.q.shape
        k_m, k_d, k_a, k_l = jax.random.split(key, 4)
        mom = jax.random.normal(k_m, (n, d_), jnp.float32)
        # randomness enters the kernel in bf16-survivable form: exact ±1
        # direction signs and strictly-negative log-uniforms (module
        # docstring; raw u near 1 would round to 1.0 in lane replication)
        sign_dir = jnp.where(
            jax.random.bernoulli(k_d, 0.5, (n, kk)), 1.0, -1.0
        ).astype(jnp.float32)
        log_u_acc = jnp.log(jnp.maximum(
            jax.random.uniform(k_a, (n, kk), jnp.float32), 1e-38))
        log_u_leaf = jnp.log(jnp.maximum(
            jax.random.uniform(k_l, (n, 1 << kk), jnp.float32), 1e-38))
        pe_tile = states.pe.reshape(n, 1)
        q2, pe2, g2, acc, div, depth, nsteps, h0 = fused_nuts_transition(
            states.q, pe_tile, states.grad, mom, sign_dir, log_u_acc,
            log_u_leaf,
            jnp.reshape(step_size, (1, 1)).astype(jnp.float32),
            jnp.reshape(inv_mass, (1, d_)),
            w1p, w2p, w1pt, w2pt, b1p, b2p, x_rep,
            sigma=sigma, n_groups=n_groups, block_chains=block_chains,
            nb=nb, latent_dim=latent_dim, data_dim=data_dim,
            max_doublings=kk, mm_dtype=mm_dtype, interpret=interpret)
        new_states = IntegratorState(
            q2, jnp.zeros_like(q2), pe2[:, 0], g2)
        info = NUTSInfo(
            accept_prob=acc[:, 0],
            diverging=div[:, 0] > 0.5,
            depth=depth[:, 0].astype(jnp.int32),
            num_steps=nsteps[:, 0].astype(jnp.int32),
            energy=h0[:, 0],
            is_accepted=jnp.any(q2 != states.q, axis=-1),
        )
        return new_states, info

    return transition
