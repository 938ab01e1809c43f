"""Fused Pallas SMC mutation stage for the GMM workload (SURVEY.md C14,
BASELINE configs[3]; VERDICT r4 item 5 — the oldest open perf item).

The XLA mutation path (infer/smc/smc.py:_mutate) issues ~K·(L+1) separate
fused value+grad launches per tempering stage (25-30 at the benchmark's
K=5 mutation steps x 5 leapfrogs) plus the XLA glue between them; the
stage measured 1.1% MFU.  This kernel runs the WHOLE stage mutation — all
K HMC transitions with their leapfrog trajectories, MH accepts, and the
per-stage dual-averaging step-size adaptation — as ONE kernel launch per
particle block, every buffer VMEM-resident.

Potential (matches core.logjoint.build_logjoint on models/gmm.make_model
EXACTLY, constants included — asserted in tests/test_fused_smc_gmm.py):

    pe_beta(q) = -[log Dirichlet(1)(w) + ldj_SB(uw)]
                 + sum mus^2/50 + K*D*(log 5 + 0.5 log 2pi)
                 + sum_k [sig_k^2/8 - us_k] - K*(0.5 log(2/pi) - log 2)
                 - beta * loglik(q)

with q the flat UNCONSTRAINED particle vector in unraveler site order
(uw: K-1 stick-breaking coords, mus: K*D, us: K log-scales), padded to
128 lanes (pads carry zero momentum and zero gradient, so they are
fixed points of the dynamics).

Design notes (conventions shared with ops/fused_nuts.py, ops/gmm_logprob.py):
  * one shared pure-jnp core (``mutation_core``): the Pallas kernel body
    and the CPU/test path call the same function — interpret parity is
    exact by construction;
  * randomness (momenta, MH uniforms) is drawn OUTSIDE with jax.random
    and passed in; uniforms enter in LOG space (log u < log a compares
    sign-safely at any matmul precision — the fused_nuts lesson);
  * likelihood matmul precision split (ops/gmm_logprob.py): VALUE dots
    (mu_k . x, which enter pe and thus MH ratios) run the 3-pass hi/lo
    bf16 split at ~f32 accuracy; GRADIENT dots run one bf16 pass —
    leapfrog with any fixed gradient field is volume-preserving and
    reversible, so gradient precision changes trajectory quality only;
  * dual averaging is PER PARTICLE BLOCK (the XLA path pools the accept
    statistic over the whole population): each block's K transitions
    adapt on the block's mean accept; the carried next-stage step is the
    geometric mean over blocks.  Same t0=2 / mu=log(carried step)
    tracking configuration as smc.py:_mutate;
  * the final particles' log-likelihood is RETURNED: the next stage's
    conditional-ESS bisection and reweight need loglik(q) of exactly
    these particles, so the stage loop reuses it instead of relaunching
    the batched likelihood (one fewer full data pass per stage).

Reference citation impossible — /root/reference is empty (SURVEY.md §0).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["make_gmm_potential_flat", "mutation_core", "fused_gmm_mutate",
           "make_batched_mutation"]

_LOG_2PI = math.log(2.0 * math.pi)
_PB = 128      # particles per block (ops/gmm_logprob.py rationale)
_BN = 512      # lane-dim block of data points


def _dot_3x(a, b, dims):
    """f32-accurate dot via 3 single-pass bf16 MXU products."""
    a_hi = a.astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = functools.partial(lax.dot_general, dimension_numbers=dims,
                            preferred_element_type=jnp.float32)
    return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)


def make_gmm_potential_flat(xt, n, k, d, bn=_BN):
    """pg(q, beta) -> (pe (C,1), grad (C,128), ll (C,1)) on the padded
    lane layout; xt is the (d, n_pad) transposed data with n real
    columns.  Pure jnp: runs inside the kernel and as the test oracle."""
    n_pad = xt.shape[1]
    assert n_pad % bn == 0
    dim = (k - 1) + k * d + k
    assert dim <= 128
    off_mu = k - 1
    off_us = k - 1 + k * d
    const_mus = k * d * (0.5 * _LOG_2PI + math.log(5.0))
    const_sig = -k * (0.5 * math.log(2.0 / math.pi) - math.log(2.0))
    const_w = -math.lgamma(k)          # -log Dirichlet(1) density

    def pg(q, beta):
        c = q.shape[0]
        uw = q[:, 0:k - 1]                                # (C, K-1)
        us = q[:, off_us:off_us + k]                      # (C, K)
        sig = jnp.exp(us)
        # stick-breaking offsets log(K-1-j), built in-kernel from scalar
        # constants (a closure jnp constant would be rejected by
        # pallas_call; Mosaic's iota is integer-only)
        sb_off = jnp.concatenate(
            [jnp.full((1, 1), math.log(k - 1 - j), jnp.float32)
             for j in range(k - 1)], axis=1)
        t = uw - sb_off
        z = jax.nn.sigmoid(t)
        log_z = -jax.nn.softplus(-t)
        log1mz = -jax.nn.softplus(t)
        # log w_k = log z_k + sum_{j<k} log(1-z_j); last = full remainder
        cums = _cumsum_cols(log1mz)                       # (C, K-1)
        logw_cols = [log_z[:, 0:1]]
        for kk in range(1, k - 1):
            logw_cols.append(log_z[:, kk:kk + 1] + cums[:, kk - 1:kk])
        logw_cols.append(cums[:, k - 2:k - 1])
        logw = jnp.concatenate(logw_cols, axis=1)         # (C, K)

        # ldj_SB = sum_j [log z_j + log(1-z_j) + sum_{i<j} log(1-z_i)]
        rem_excl = jnp.concatenate(
            [jnp.zeros_like(cums[:, :1]), cums[:, :-1]], axis=1)
        ldj = jnp.sum(log_z + log1mz + rem_excl, axis=1, keepdims=True)

        # ---- likelihood value + parameter-space gradient, chunked ------
        ll = jnp.zeros((c, 1), jnp.float32)
        dlogw = jnp.zeros((c, k), jnp.float32)
        dmus_cols = [jnp.zeros((c, d), jnp.float32) for _ in range(k)]
        dsig = jnp.zeros((c, k), jnp.float32)
        inv_s2 = 1.0 / (sig * sig)                        # (C, K)
        for blk in range(n_pad // bn):
            xb = xt[:, blk * bn:(blk + 1) * bn]           # (d, bn)
            x2 = jnp.sum(xb * xb, axis=0, keepdims=True)  # (1, bn)
            j = lax.broadcasted_iota(jnp.int32, (1, bn), 1) + blk * bn
            mask = j < n
            lls, qs = [], []
            for kk in range(k):
                mu_k = q[:, off_mu + kk * d:off_mu + (kk + 1) * d]
                # at d ~ 2 the contraction is degenerate: d broadcast
                # multiply-adds on the VPU are EXACT f32 and ~25x faster
                # than 3-pass MXU dots (measured: the dot version made
                # the mutation kernel 1.08 ms/eval vs the 0.47 ms
                # standalone kernel)
                cross = mu_k[:, 0:1] * xb[0:1, :]
                for j in range(1, d):
                    cross = cross + mu_k[:, j:j + 1] * xb[j:j + 1, :]
                mu2 = jnp.sum(mu_k * mu_k, axis=1, keepdims=True)
                q_k = x2 - 2.0 * cross + mu2              # (C, bn)
                s_k = sig[:, kk:kk + 1]
                ll_k = (logw[:, kk:kk + 1]
                        - q_k * (0.5 * inv_s2[:, kk:kk + 1])
                        - d * us[:, kk:kk + 1] - 0.5 * d * _LOG_2PI)
                lls.append(ll_k)
                qs.append(q_k)
            # max-first logsumexp: K exps + 1 log + 1 reciprocal total,
            # and the SAME exps are reused for the responsibilities —
            # the streaming form cost ~3K-2 exps per chunk and the
            # kernel is VPU-transcendental-bound
            m = lls[0]
            for ll_k in lls[1:]:
                m = jnp.maximum(m, ll_k)
            es = [jnp.exp(ll_k - m) for ll_k in lls]
            s = es[0]
            for e_k in es[1:]:
                s = s + e_k
            lse = m + jnp.log(s)
            inv_s = 1.0 / s
            ll = ll + jnp.sum(jnp.where(mask, lse, 0.0), axis=1,
                              keepdims=True)
            for kk in range(k):
                resp = jnp.where(mask, es[kk] * inv_s, 0.0)
                r_sum = jnp.sum(resp, axis=1, keepdims=True)
                rq_sum = jnp.sum(resp * qs[kk], axis=1, keepdims=True)
                rx = jnp.concatenate(
                    [jnp.sum(resp * xb[j:j + 1, :], axis=1, keepdims=True)
                     for j in range(d)], axis=1)          # (C, d), exact
                mu_k = q[:, off_mu + kk * d:off_mu + (kk + 1) * d]
                i2 = inv_s2[:, kk:kk + 1]
                dlogw = _col_add(dlogw, kk, r_sum)
                dmus_cols[kk] = dmus_cols[kk] + (rx - mu_k * r_sum) * i2
                dsig = _col_add(
                    dsig, kk,
                    rq_sum * i2 / sig[:, kk:kk + 1]
                    - d * r_sum / sig[:, kk:kk + 1])

        # ---- assemble potential ---------------------------------------
        mus_all = q[:, off_mu:off_mu + k * d]
        pe = (const_w - ldj
              + jnp.sum(mus_all * mus_all, axis=1, keepdims=True) / 50.0
              + const_mus
              + jnp.sum(sig * sig, axis=1, keepdims=True) / 8.0
              - jnp.sum(us, axis=1, keepdims=True) + const_sig
              - beta * ll)

        # ---- gradient pullback to unconstrained space ------------------
        # d ll/d uw_j = dlogw_j (1 - z_j) - z_j * sum_{k>j} dlogw_k
        # d ldj/d uw_j = (1 - 2 z_j) - z_j * (K - 2 - j)
        tail = _suffix_sum_cols(dlogw)                       # sum_{k>=j}
        guw_cols = []
        for jj in range(k - 1):
            z_j = z[:, jj:jj + 1]
            dll = (dlogw[:, jj:jj + 1] * (1.0 - z_j)
                   - z_j * tail[:, jj + 1:jj + 2])
            dldj = (1.0 - 2.0 * z_j) - z_j * float(k - 2 - jj)
            guw_cols.append(-dldj - beta * dll)
        guw = jnp.concatenate(guw_cols, axis=1)           # (C, K-1)
        gmus = (mus_all / 25.0
                - beta * jnp.concatenate(dmus_cols, axis=1))
        gus = (sig * sig / 4.0 - 1.0 - beta * dsig * sig)
        pad = q[:, dim:] * 0.0
        grad = jnp.concatenate([guw, gmus, gus, pad], axis=1)
        return pe, grad, ll

    return pg


def _cumsum_cols(m):
    """Unrolled column-wise prefix sum (Mosaic has no cumsum lowering;
    K is tiny)."""
    cols = [m[:, 0:1]]
    for j in range(1, m.shape[1]):
        cols.append(cols[-1] + m[:, j:j + 1])
    return jnp.concatenate(cols, axis=1)


def _suffix_sum_cols(m):
    """Unrolled column-wise suffix sum: out[:, j] = sum_{k>=j} m[:, k]."""
    k = m.shape[1]
    cols = [None] * k
    cols[k - 1] = m[:, k - 1:k]
    for j in range(k - 2, -1, -1):
        cols[j] = cols[j + 1] + m[:, j:j + 1]
    return jnp.concatenate(cols, axis=1)


def _col_add(arr, kk, col):
    """arr (C, K) with column kk incremented by col (C, 1) — lane-masked
    add (in-kernel .at[] indexed updates are not Mosaic-friendly)."""
    lanes = lax.broadcasted_iota(jnp.int32, arr.shape, 1)
    return arr + jnp.where(lanes == kk, col, 0.0)


# ---------------------------------------------------------------------------
# the shared mutation core (pure jnp)
# ---------------------------------------------------------------------------

def mutation_core(q, mom_all, log_u, beta, eps0, m_inv, pg, kmut, lsteps,
                  target_accept):
    """K HMC transitions for one block of C particles, with per-block
    dual averaging across the transitions (t0=2, mu=log eps0 — the
    smc.py:_mutate tracking configuration).

    Shapes: q (C, 128); mom_all (kmut, C, 128) pre-scaled momenta with
    ZERO pad lanes — or a callable ``t -> (C, 128)`` (the Pallas kernel
    passes a Ref indexer: Mosaic has no dynamic_slice lowering on
    VALUES, but dynamic leading-dim indexing of a Ref is supported);
    log_u (C, kmut) strictly-negative log-uniforms; beta/eps0 (1, 1);
    m_inv (1, 128).  Returns (q', ll', mean-accept (C, 1), next-step
    (1, 1))."""
    c = q.shape[0]
    if callable(mom_all):
        mom_fn = mom_all
    else:
        mom_fn = lambda t: lax.dynamic_slice(  # noqa: E731
            mom_all, (t, 0, 0), (1,) + mom_all.shape[1:])[0]
    pe, g, ll = pg(q, beta)
    log_eps0 = jnp.log(eps0)                              # (1, 1) = mu
    zero11 = jnp.zeros_like(log_eps0)

    def trans(t, carry):
        q, pe, g, ll, acc_sum, log_step, log_avg, grad_avg, tda = carry
        eps = jnp.exp(log_step)
        p0 = mom_fn(t)
        h0 = pe + 0.5 * jnp.sum(p0 * p0 * m_inv, axis=1, keepdims=True)

        def leap(_l, s):
            qq, pp, gg, _pe, _ll = s
            pp = pp - 0.5 * eps * gg
            qq = qq + eps * m_inv * pp
            pe_n, gg2, ll_n = pg(qq, beta)
            pp = pp - 0.5 * eps * gg2
            return qq, pp, gg2, pe_n, ll_n

        qe, pf, ge, pe1, ll1 = lax.fori_loop(
            0, lsteps, leap, (q, p0, g, pe, ll))
        h1 = pe1 + 0.5 * jnp.sum(pf * pf * m_inv, axis=1, keepdims=True)
        delta = h1 - h0
        delta = jnp.where(jnp.isnan(delta), jnp.inf, delta)
        log_a = jnp.minimum(0.0, -delta)                  # (C, 1)
        a = jnp.exp(log_a)
        lanes = lax.broadcasted_iota(jnp.int32, log_u.shape, 1)
        lu = jnp.sum(jnp.where(lanes == t, log_u, 0.0), axis=1,
                     keepdims=True)
        take = lu < log_a
        q2 = jnp.where(take, qe, q)
        pe2 = jnp.where(take, pe1, pe)
        g2 = jnp.where(take, ge, g)
        ll2 = jnp.where(take, ll1, ll)

        # dual averaging on the block-mean accept (adapt.py:da_update
        # with t0=2.0, gamma=0.05, kappa=0.75, mu=log eps0)
        a_mean = jnp.mean(a, axis=0, keepdims=True)       # (1, 1)
        t2 = tda + 1.0
        eta_h = 1.0 / (t2 + 2.0)
        grad_avg2 = ((1.0 - eta_h) * grad_avg
                     + eta_h * (target_accept - a_mean))
        log_step2 = log_eps0 - jnp.sqrt(t2) / 0.05 * grad_avg2
        eta_x = jnp.exp(-0.75 * jnp.log(t2))
        log_avg2 = eta_x * log_step2 + (1.0 - eta_x) * log_avg
        return (q2, pe2, g2, ll2, acc_sum + a,
                log_step2, log_avg2, grad_avg2, t2)

    init = (q, pe, g, ll, jnp.zeros((c, 1), jnp.float32),
            log_eps0, log_eps0, zero11, zero11)
    (q, pe, g, ll, acc_sum, _ls, log_avg, _ga, _t) = lax.fori_loop(
        0, kmut, trans, init)
    return q, ll, acc_sum / float(kmut), jnp.exp(log_avg)


# ---------------------------------------------------------------------------
# Pallas wrapper
# ---------------------------------------------------------------------------

def _kernel(beta_ref, eps_ref, q_ref, mom_ref, lu_ref, minv_ref, xt_ref,
            qo_ref, llo_ref, acco_ref, epso_ref, *, n, k, d, bn, kmut,
            lsteps, target_accept):
    pg = make_gmm_potential_flat(xt_ref[...], n, k, d, bn=bn)
    beta = beta_ref[0, 0] + jnp.zeros((1, 1), jnp.float32)
    eps0 = eps_ref[0, 0] + jnp.zeros((1, 1), jnp.float32)
    q2, ll2, acc, eps_next = mutation_core(
        q_ref[...], lambda t: mom_ref[t], lu_ref[...], beta, eps0,
        minv_ref[...], pg, kmut, lsteps, target_accept)
    qo_ref[...] = q2
    llo_ref[...] = ll2
    acco_ref[...] = acc
    # per-block scalar, replicated over the block's rows: Mosaic requires
    # output block shapes of (8k, 128m) or full-array dims — a (1, 1)
    # block is rejected, a (PB, 1) block matches the other outputs
    epso_ref[...] = jnp.broadcast_to(eps_next, acc.shape)


@functools.partial(
    jax.jit,
    static_argnames=("n", "k", "d", "kmut", "lsteps", "target_accept",
                     "bn", "interpret"))
def fused_gmm_mutate(q128, mom, log_u, beta, step_size, m_inv, xt, *, n, k,
                     d, kmut, lsteps, target_accept, bn=_BN,
                     interpret=False):
    """One launch per particle block: q128 (P, 128) lane-padded particles;
    mom (kmut, P, 128) pre-scaled momenta (zero pads); log_u (P, kmut);
    beta/step_size (1, 1); m_inv (1, 128); xt (d, n_pad).  Returns
    (q' (P, 128), ll (P, 1), accept (P, 1), per-block eps (P//PB, 1))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p = q128.shape[0]
    assert p % _PB == 0
    kernel = functools.partial(
        _kernel, n=n, k=k, d=d, bn=bn, kmut=kmut, lsteps=lsteps,
        target_accept=target_accept)
    vm = pltpu.VMEM
    smem = lambda: pl.BlockSpec((1, 1), lambda i: (0, 0),  # noqa: E731
                                memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(p // _PB,),
        in_specs=[
            smem(), smem(),
            pl.BlockSpec((_PB, 128), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((kmut, _PB, 128), lambda i: (0, i, 0),
                         memory_space=vm),
            pl.BlockSpec((_PB, kmut), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec(xt.shape, lambda i: (0, 0), memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((_PB, 128), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((_PB, 1), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((_PB, 1), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((_PB, 1), lambda i: (i, 0), memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((p, 128), jnp.float32),
            jax.ShapeDtypeStruct((p, 1), jnp.float32),
            jax.ShapeDtypeStruct((p, 1), jnp.float32),
            # per-block eps, replicated over each block's rows (Mosaic
            # rejects (1, 1) output blocks — see _kernel)
            jax.ShapeDtypeStruct((p, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(beta, step_size, q128, mom, log_u, m_inv, xt)
    return outs


# ---------------------------------------------------------------------------
# SMC integration
# ---------------------------------------------------------------------------

def make_batched_mutation(x, k, d, dim, *, kmut, lsteps,
                          target_accept=0.65, bn=_BN, interpret=None):
    """Build a ``batched_mutation(key, q, beta, step_size, m_inv)`` for
    infer/smc/SMC: the whole stage mutation in one kernel launch,
    returning ``(q', ll', accept, next_step)`` with ll' the final
    particles' log-likelihood (reused by the next stage's reweight)."""
    n, d_x = x.shape
    assert d_x == d
    n_pad = ((n + bn - 1) // bn) * bn
    xt = jnp.pad(jnp.asarray(x, jnp.float32).T, ((0, 0), (0, n_pad - n)))

    def mutate(key, q, beta, step_size, m_inv=None):
        interp = (jax.default_backend() != "tpu" if interpret is None
                  else interpret)
        p, dm = q.shape
        assert dm == dim
        p_pad = ((p + _PB - 1) // _PB) * _PB
        if m_inv is None:
            m_inv = jnp.ones((dim,), jnp.float32)
        minv128 = jnp.concatenate(
            [jnp.reshape(m_inv, (1, dim)).astype(jnp.float32),
             jnp.ones((1, 128 - dim), jnp.float32)], axis=1)
        sqrt_m = 1.0 / jnp.sqrt(minv128)
        k_mom, k_acc = jax.random.split(key)
        q128 = jnp.pad(q, ((0, p_pad - p), (0, 128 - dim)))
        mom = (jax.random.normal(k_mom, (kmut, p_pad, dim), jnp.float32)
               * sqrt_m[:, :dim])
        mom = jnp.pad(mom, ((0, 0), (0, 0), (0, 128 - dim)))
        log_u = jnp.log(jnp.maximum(
            jax.random.uniform(k_acc, (p_pad, kmut), jnp.float32), 1e-38))
        q2, ll, acc, eps_b = fused_gmm_mutate(
            q128, mom, log_u, jnp.reshape(beta, (1, 1)).astype(jnp.float32),
            jnp.reshape(step_size, (1, 1)).astype(jnp.float32),
            minv128, xt, n=n, k=k, d=d, kmut=kmut, lsteps=lsteps,
            target_accept=target_accept, bn=bn, interpret=interp)
        next_step = jnp.clip(jnp.exp(jnp.mean(jnp.log(eps_b))), 1e-5, 2.0)
        return (q2[:p, :dim], ll[:p, 0], jnp.mean(acc[:p, 0]), next_step)

    return mutate
