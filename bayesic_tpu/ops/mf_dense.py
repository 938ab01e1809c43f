"""Fused Pallas kernel for the dense matrix-factorization ELBO (SURVEY.md
C14b / C18; VERDICT r2 item 2).

`models/matrix_fact.dense_neg_elbo` is exact and deterministic, but its XLA
lowering materializes the (num_users, num_items) mean/variance/gradient
fields in HBM several times per step.  The information content per step is
just the two sufficient-statistic arrays (cnt, rsum) read ONCE — everything
else is O(users*K + items*K).  This kernel fuses the entire cell-space
computation (2 forward + 4 backward matmuls + all elementwise) into one
pass over (cnt, rsum) tiles, so per-step HBM traffic drops to the
information-theoretic floor: cnt (bf16, exact for integer counts) + rsum
(f32) + the tiny factor matrices.

Structure — biases fold into augmented factor lanes so the whole objective
is matmuls (A = augmented width, K factors):

  Ua   = [u_loc | bu_loc | 1]            (NU, A)
  Va   = [v_loc | 1 | bi_loc + m_loc]    (NI, A)
  mean = Ua @ Va^T
  Wu   = [Eu2a | U2a],  Wv = [Ev2a | -V2a]      (*, 2A)
    Eu2a = [u_loc^2 + e^{2 u_ls} | e^{2 bu_ls} | 1]
    Ev2a = [v_loc^2 + e^{2 v_ls} | 1 | e^{2 bi_ls} + e^{2 m_ls}]
    U2a  = [u_loc^2 | 0 | 0],  V2a = [v_loc^2 | 0 | 0]
  var  = Wu @ Wv^T     (= sum_c Eu2 Ev2 - mu_u^2 mu_v^2  + bias vars)
  cells = sum cnt*(var + mean^2) - 2 rsum*mean
  d/dmean = 2(cnt*mean - rsum) =: G ;  d/dvar = cnt
  dUa = G @ Va, dWu = cnt @ Wv, dVa = G^T @ Ua, dWv = cnt^T @ Wu

Grid: item blocks only (full user rows per block) — dUa/dWu accumulate in
VMEM across consecutive grid steps; dVa/dWv blocks are unique per step.
Matmul operands can be cast to bf16 (f32 accumulation) via ``mm_dtype`` —
the contraction is over the A-lane padding anyway, and cnt/rsum stay exact
in the elementwise path.  No RNG: the objective is deterministic, so the
interpret-mode parity test on CPU covers the real math exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

AUG = 32        # augmented lane width; needs num_factors + 2 <= AUG


def _pad_rows(x, n):
    return jnp.pad(x, ((0, n - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


def pack_stats(cnt, rsum, block_items=128):
    """Pad (cnt, rsum) to TPU-friendly shapes: users to a multiple of 8
    sublanes, items to a multiple of the item block.  cnt travels bf16
    (exact for integer counts < 257); rsum stays f32."""
    nu, ni = cnt.shape
    nu_p = -(-nu // 8) * 8
    ni_p = -(-ni // block_items) * block_items
    cnt_p = jnp.zeros((nu_p, ni_p), jnp.bfloat16).at[:nu, :ni].set(
        cnt.astype(jnp.bfloat16))
    rsum_p = jnp.zeros((nu_p, ni_p), jnp.float32).at[:nu, :ni].set(rsum)
    return cnt_p, rsum_p


def pack_aug(params, nu_p, ni_p):
    """Mean-field params {site: (loc, ls)} -> (Ua, Wu, Va, Wv)."""
    (u_loc, u_ls), (v_loc, v_ls) = params["u"], params["v"]
    (bu_loc, bu_ls), (bi_loc, bi_ls) = params["bu"], params["bi"]
    m_loc, m_ls = params["m"]
    k = u_loc.shape[1]
    if k + 2 > AUG:
        raise ValueError(f"num_factors={k} needs AUG >= {k + 2}")
    nu, ni = u_loc.shape[0], v_loc.shape[0]

    def aug(cols, n, rows):
        out = jnp.zeros((rows, AUG), jnp.float32)
        c0 = 0
        for c in cols:
            w = c.shape[1]
            out = out.at[:n, c0:c0 + w].set(c)
            c0 += w
        return out

    ones_u, ones_i = jnp.ones((nu, 1)), jnp.ones((ni, 1))
    ua = aug([u_loc, bu_loc[:, None], ones_u], nu, nu_p)
    va = aug([v_loc, ones_i, (bi_loc + m_loc)[:, None]], ni, ni_p)
    eu2a = aug([u_loc ** 2 + jnp.exp(2 * u_ls),
                jnp.exp(2 * bu_ls)[:, None], ones_u], nu, nu_p)
    ev2a = aug([v_loc ** 2 + jnp.exp(2 * v_ls), ones_i,
                (jnp.exp(2 * bi_ls) + jnp.exp(2 * m_ls))[:, None]],
               ni, ni_p)
    u2a = aug([u_loc ** 2], nu, nu_p)
    v2a = aug([v_loc ** 2], ni, ni_p)
    wu = jnp.concatenate([eu2a, u2a], axis=1)
    wv = jnp.concatenate([ev2a, -v2a], axis=1)
    return ua, wu, va, wv


def _cell_kernel(cnt_ref, rsum_ref, ua_ref, wu_ref, va_ref, wv_ref,
                 loss_ref, dua_ref, dwu_ref, dva_ref, dwv_ref, *, mm_dtype):
    from jax.experimental import pallas as pl

    j = pl.program_id(0)
    dot = functools.partial(jax.lax.dot_general,
                            preferred_element_type=jnp.float32)
    cv = lambda a: a.astype(mm_dtype)                          # noqa: E731
    mm = lambda a, b: dot(cv(a), cv(b),                        # noqa: E731
                          (((1,), (0,)), ((), ())))
    mm_nt = lambda a, b: dot(cv(a), cv(b),                     # noqa: E731
                             (((1,), (1,)), ((), ())))
    mm_tn = lambda a, b: dot(cv(a), cv(b),                     # noqa: E731
                             (((0,), (0,)), ((), ())))

    cnt = cnt_ref[...].astype(jnp.float32)
    rsum = rsum_ref[...]
    ua, wu = ua_ref[...], wu_ref[...]
    va, wv = va_ref[...], wv_ref[...]

    mean = mm_nt(ua, va)                       # (NU, BI)
    var = mm_nt(wu, wv)
    g = 2.0 * (cnt * mean - rsum)
    part = jnp.sum(cnt * (var + mean * mean) - 2.0 * rsum * mean)

    @pl.when(j == 0)
    def _init():
        loss_ref[...] = jnp.zeros_like(loss_ref)
        dua_ref[...] = jnp.zeros_like(dua_ref)
        dwu_ref[...] = jnp.zeros_like(dwu_ref)

    # keep the accumulation rank-2: Mosaic cannot store scalars to VMEM
    # ("loss_ref[0, 0] += part" fails to compile on real TPU)
    loss_ref[...] += jnp.reshape(part, (1, 1))
    dua_ref[...] += mm(g, va)                  # (NU, A)
    dwu_ref[...] += mm(cnt, wv)                # (NU, 2A)
    dva_ref[...] = mm_tn(g, ua)                # (BI, A)
    dwv_ref[...] = mm_tn(cnt, wu)              # (BI, 2A)


@functools.partial(jax.jit, static_argnames=("block_items", "mm_dtype",
                                             "interpret"))
def cell_grads(cnt_p, rsum_p, ua, wu, va, wv, *, block_items=128,
               mm_dtype="float32", interpret=False):
    """One fused pass: returns (cells, dUa, dWu, dVa, dWv) for the padded
    inputs (see module docstring for definitions)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nu_p, ni_p = cnt_p.shape
    bi = block_items
    grid = (ni_p // bi,)
    kernel = functools.partial(
        _cell_kernel,
        mm_dtype=jnp.bfloat16 if mm_dtype == "bfloat16" else jnp.float32)
    f32 = jnp.float32
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nu_p, bi), lambda j: (0, j)),       # cnt
            pl.BlockSpec((nu_p, bi), lambda j: (0, j)),       # rsum
            pl.BlockSpec((nu_p, AUG), lambda j: (0, 0)),      # ua
            pl.BlockSpec((nu_p, 2 * AUG), lambda j: (0, 0)),  # wu
            pl.BlockSpec((bi, AUG), lambda j: (j, 0)),        # va
            pl.BlockSpec((bi, 2 * AUG), lambda j: (j, 0)),    # wv
        ],
        out_specs=(
            pl.BlockSpec((1, 1), lambda j: (0, 0)),           # loss
            pl.BlockSpec((nu_p, AUG), lambda j: (0, 0)),      # dua
            pl.BlockSpec((nu_p, 2 * AUG), lambda j: (0, 0)),  # dwu
            pl.BlockSpec((bi, AUG), lambda j: (j, 0)),        # dva
            pl.BlockSpec((bi, 2 * AUG), lambda j: (j, 0)),    # dwv
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), f32),
            jax.ShapeDtypeStruct((nu_p, AUG), f32),
            jax.ShapeDtypeStruct((nu_p, 2 * AUG), f32),
            jax.ShapeDtypeStruct((ni_p, AUG), f32),
            jax.ShapeDtypeStruct((ni_p, 2 * AUG), f32),
        ),
        interpret=interpret,
    )(cnt_p, rsum_p, ua, wu, va, wv)
    return outs


def _kl_total(params):
    from ..models.matrix_fact import _kl_normal

    return (_kl_normal(*params["u"], 0.0, 1.0)
            + _kl_normal(*params["v"], 0.0, 1.0)
            + _kl_normal(*params["bu"], 0.0, 0.5)
            + _kl_normal(*params["bi"], 0.0, 0.5)
            + _kl_normal(*params["m"], 3.0, 1.0))


def dense_value_and_grad(params, cnt_p, rsum_p, sqsum, n_ratings, noise,
                         *, block_items=128, mm_dtype="float32",
                         interpret=False):
    """(loss, grads) of models/matrix_fact.dense_neg_elbo, with the
    cell-space work in the fused kernel and the O(params) chain
    rule + analytic KL in XLA.  grads match params' structure."""
    (u_loc, u_ls), (v_loc, v_ls) = params["u"], params["v"]
    (bu_loc, bu_ls), (bi_loc, bi_ls) = params["bu"], params["bi"]
    m_loc, m_ls = params["m"]
    k = u_loc.shape[1]
    nu, ni = u_loc.shape[0], v_loc.shape[0]
    nu_p, ni_p = cnt_p.shape

    ua, wu, va, wv = pack_aug(params, nu_p, ni_p)
    cells, dua, dwu, dva, dwv = cell_grads(
        cnt_p, rsum_p, ua, wu, va, wv, block_items=block_items,
        mm_dtype=mm_dtype, interpret=interpret)
    s = 0.5 / noise ** 2          # neg_elbo = s*(cells + sqsum) + const + KL
    deu2a = dwu[:nu, :AUG]
    du2a = dwu[:nu, AUG:]
    dev2a = dwv[:ni, :AUG]
    dv2a = -dwv[:ni, AUG:]
    dua, dva = dua[:nu], dva[:ni]

    g = {
        "u": (s * (dua[:, :k] + (deu2a[:, :k] + du2a[:, :k]) * 2 * u_loc),
              s * deu2a[:, :k] * 2 * jnp.exp(2 * u_ls)),
        "v": (s * (dva[:, :k] + (dev2a[:, :k] + dv2a[:, :k]) * 2 * v_loc),
              s * dev2a[:, :k] * 2 * jnp.exp(2 * v_ls)),
        "bu": (s * dua[:, k],
               s * deu2a[:, k] * 2 * jnp.exp(2 * bu_ls)),
        "bi": (s * dva[:, k + 1],
               s * dev2a[:, k + 1] * 2 * jnp.exp(2 * bi_ls)),
        "m": (s * jnp.sum(dva[:, k + 1]),
              s * jnp.sum(dev2a[:, k + 1]) * 2 * jnp.exp(2 * m_ls)),
    }
    kl, kl_grads = jax.value_and_grad(_kl_total)(params)
    grads = jax.tree_util.tree_map(jnp.add, g, kl_grads)
    loss = (s * (cells[0, 0] + sqsum)
            + n_ratings * (np.log(noise) + 0.5 * np.log(2.0 * np.pi))
            + kl)
    return loss, grads


def fused_train(params, cnt, rsum, sqsum, n_ratings, noise, *, steps, lr,
                block_items=128, mm_dtype="float32", opt_state=None,
                interpret=False):
    """Scan `steps` fused dense-ELBO Adam steps; returns
    (params, opt_state, losses)."""
    import optax

    cnt_p, rsum_p = pack_stats(cnt, rsum, block_items)
    opt = optax.adam(lr)
    if opt_state is None:
        opt_state = opt.init(params)

    @functools.partial(jax.jit, static_argnames=())
    def run(params, opt_state, cnt_p, rsum_p):
        def body(carry, _):
            p, st = carry
            loss, grads = dense_value_and_grad(
                p, cnt_p, rsum_p, sqsum, n_ratings, noise,
                block_items=block_items, mm_dtype=mm_dtype,
                interpret=interpret)
            upd, st = opt.update(grads, st, p)
            return (optax.apply_updates(p, upd), st), loss

        return jax.lax.scan(body, (params, opt_state), None, length=steps)

    (params, opt_state), losses = run(params, opt_state, cnt_p, rsum_p)
    return params, opt_state, losses
