"""Whole-run fused trainer for the hierarchical-logistic SVI workload.

Blueprint: the `ops/fused_vae.py` recipe applied to BASELINE configs[1]
(SURVEY.md C17): the XLA step is overhead-bound (measured MFU ~1e-5 — a
65-dim mean-field update on a B=1024 logistic minibatch is ~0.5 MFLOP
spread over dozens of tiny ops), so the win is ONE Pallas program for the
whole run: dataset, guide params, and Adam state VMEM-resident, `steps`
complete STL-ELBO steps per launch with the on-core PRNG.

Semantics match `SVI(make_model(...), MeanFieldGuide,
optax.adam(cosine_decay(lr0, T)))` on `models/hier_logistic.py`
(non-centered parameterization) EXCEPT:
  * the PRNG stream (TPU core PRNG vs jax.random — agree in distribution);
  * minibatches are uniformly-offset circular blocks of a one-time host
    shuffle instead of iid-uniform rows (exact uniform row marginals, so
    the minibatch ELBO gradient stays unbiased — the `fused_vae` "block"
    contract).

Data layout — ONE (N, 128) f32 matrix in VMEM, columns:
  0..D-1  features x          D=5
  5       y (0/1)
  6       constant 1.0        (mu's column)
  8..8+J  group one-hot       J=50
Parameter layout — (1, 128) lane vectors (loc, log_scale and Adam state):
  lane 0 mu, lane 1 log-tau, lanes 2..2+J theta_raw, lanes 2+J+.. beta.
The likelihood needs exactly TWO MXU matvecs per step: logits = Xb @ w
with w = tau * (M_th z) + (M_b z) + mu e6, and the backward g_w = Xb^T g.
Static selector matrices M_th/M_b move values between the two layouts.

Math (non-centered; s = N/B, c = .5 ln 2pi, guide q = N(loc, e^ls)):
  z    = loc + e^ls eps
  logit= theta[g] + x beta + .. = Xb w
  elbo = s*sum(y*logit - softplus(logit))
         + [-mu^2/50 - ln5 - c] + [const - tau^2/8 + ltau]
         + sum(-th^2/2 - c) + sum(-beta^2/2 - c)
         - sum_q(-ls - eps^2/2 - c)              (STL: q-params stopped)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ._kernel_common import (adam_leaf, kernel_normal as _normal,
                             kernel_uniform as _uniform)

_C = 0.5 * float(np.log(2.0 * np.pi))

D = 5          # features
J = 50         # groups
DIM = 2 + J + D            # 57 active lanes
COL_Y, COL_ONE, COL_G0 = 5, 6, 8
LANE_MU, LANE_LTAU, LANE_TH0, LANE_B0 = 0, 1, 2, 2 + J


def _masks():
    """Selector matrices built from iota comparisons — NOT host constants:
    Mosaic rejects captured jax-array consts in kernel jaxprs, and iota
    expressions lower to cheap vector code (hoisted before the step loop)."""
    f32 = jnp.float32
    r = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    m_th = ((r == c + (COL_G0 - LANE_TH0))
            & (c >= LANE_TH0) & (c < LANE_TH0 + J)).astype(f32)
    m_b = ((r == c - LANE_B0) & (c >= LANE_B0)
           & (c < LANE_B0 + D)).astype(f32)
    col = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    e5 = (col == COL_Y).astype(f32)
    e6 = (col == COL_ONE).astype(f32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    mask = (lane < DIM).astype(f32)
    th_mask = ((lane >= LANE_TH0) & (lane < LANE_TH0 + J)).astype(f32)
    b_mask = ((lane >= LANE_B0) & (lane < LANE_B0 + D)).astype(f32)
    e_mu = (lane == LANE_MU).astype(f32)
    e_lt = (lane == LANE_LTAU).astype(f32)
    return (mask, m_th, m_b, e5, e6, th_mask, b_mask, e_mu, e_lt)


def pack_data(x, y, group):
    """(N, D) x, (N,) y, (N,) group -> the (N, 128) layout above."""
    n = x.shape[0]
    out = np.zeros((n, 128), np.float32)
    out[:, :D] = np.asarray(x, np.float32)
    out[:, COL_Y] = np.asarray(y, np.float32)
    out[:, COL_ONE] = 1.0
    out[np.arange(n), COL_G0 + np.asarray(group)] = 1.0
    return jnp.asarray(out)


def pack_params(loc_dict=None, init_scale=0.1):
    """Mean-field guide leaves in the lane layout (zeros by default)."""
    loc = np.zeros((1, 128), np.float32)
    ls = np.full((1, 128), np.log(init_scale), np.float32)
    ls[0, DIM:] = 0.0
    if loc_dict is not None:
        loc[0, LANE_MU] = loc_dict.get("mu", 0.0)
        loc[0, LANE_LTAU] = loc_dict.get("ltau", 0.0)
    return jnp.asarray(loc), jnp.asarray(ls)


def unpack_stats(loc, ls):
    """Lane vectors -> per-site unconstrained mean/std dicts (the
    MeanFieldGuide.stats contract)."""
    loc = np.asarray(loc)[0]
    sd = np.exp(np.asarray(ls)[0])
    mean = {"mu": loc[LANE_MU], "tau": loc[LANE_LTAU],
            "theta_raw": loc[LANE_TH0:LANE_TH0 + J],
            "beta": loc[LANE_B0:LANE_B0 + D]}
    std = {"mu": sd[LANE_MU], "tau": sd[LANE_LTAU],
           "theta_raw": sd[LANE_TH0:LANE_TH0 + J],
           "beta": sd[LANE_B0:LANE_B0 + D]}
    return mean, std


# ---------------------------------------------------------------------------
# shared step math (kernel AND jnp reference — one source of truth)
# ---------------------------------------------------------------------------

def _step_math(loc, ls, xb, eps, scale):
    """One STL ELBO step on a (B, 128) packed block.  Returns
    (elbo, g_loc, g_ls) — gradients of elbo (ascent)."""
    (mask, m_th, m_b, e5, e6, th_mask, b_mask, e_mu, e_lt) = _masks()
    dot = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32)
    mm = lambda a, b: dot(a, b, (((1,), (0,)), ((), ())))      # noqa: E731
    mm_tn = lambda a, b: dot(a, b, (((0,), (0,)), ((), ())))   # noqa: E731

    e_ls = jnp.exp(ls * mask) * mask
    z = (loc + e_ls * eps) * mask                     # (1, 128)
    mu = jnp.sum(z * e_mu)
    ltau = jnp.sum(z * e_lt)
    tau = jnp.exp(ltau)

    v1 = mm(z, m_th.T)                                # (1,128) theta->cols
    v2 = mm(z, m_b.T)                                 # beta->cols
    w = tau * v1 + v2 + mu * e6[:, 0][None, :]        # (1, 128)
    logits = mm(xb, w.T)                              # (B, 1)
    yb = mm(xb, e5)                                   # (B, 1)
    # y*l - softplus(l), stable
    ll = jnp.sum(yb * logits - jnp.maximum(logits, 0.0)
                 - jnp.log1p(jnp.exp(-jnp.abs(logits))))
    th = z * th_mask
    be = z * b_mask
    lp = (-mu * mu / 50.0 - jnp.log(5.0) - _C
          + 0.5 * jnp.log(2.0 / jnp.pi) - jnp.log(2.0)
          - tau * tau / 8.0 + ltau
          + jnp.sum(-0.5 * th * th - _C * th_mask)
          + jnp.sum(-0.5 * be * be - _C * b_mask))
    logq = jnp.sum((-ls - 0.5 * eps * eps - _C) * mask)
    elbo = scale * ll + lp - logq

    # backward (d elbo / d z, then chain to loc/ls)
    sig = jax.nn.sigmoid(logits)
    g_log = scale * (yb - sig)                        # (B, 1)
    g_w = mm_tn(xb, g_log)                            # (128, 1)
    g_mu_lik = jnp.sum(g_w * e6)
    g_tau_lik = jnp.sum(v1 * g_w[:, 0][None, :])
    g_z = (tau * mm(g_w.T, m_th) + mm(g_w.T, m_b))    # (1, 128)
    g_z = g_z + g_mu_lik * e_mu + (g_tau_lik * tau) * e_lt
    # priors
    g_z = g_z + (-mu / 25.0) * e_mu \
        + (-tau * tau / 4.0 + 1.0) * e_lt \
        - th - be
    # STL: d(-logq)/dz = eps e^{-ls}
    g_z = (g_z + eps * jnp.exp(-ls * mask) * mask) * mask
    g_loc = g_z
    g_ls = g_z * eps * e_ls
    return elbo, g_loc, g_ls


_adam = adam_leaf


def _lr_at(t, lr0, total):
    """optax.cosine_decay_schedule(lr0, total)."""
    frac = jnp.minimum(t / float(total), 1.0)
    return lr0 * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))


# ---------------------------------------------------------------------------

def _train_kernel(seed_ref, t0_ref, x_ref, loc_ref, ls_ref,
                  m1_ref, m2_ref, v1_ref, v2_ref,
                  losses_ref, loc_out, ls_out, m1o, m2o, v1o, v2o,
                  *, n, n_total, b, steps, lr0, lr_total, thin):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(seed_ref[0])
    # DP composition: minibatches come from the LOCAL shard (n rows) but
    # the likelihood is scaled to the GLOBAL dataset (n_total) so each
    # device's objective is an unbiased estimate of the full ELBO
    scale = n_total / b

    def body(i, carry):
        loc, ls, m1, m2, v1, v2 = carry
        u0 = _uniform((8, 128))
        off = jnp.minimum((u0[0, 0] * n).astype(jnp.int32), n - 1)
        xb = x_ref[pl.ds(off, b), :]
        eps = _normal((8, 128))[0:1, :]
        elbo, g_loc, g_ls = _step_math(loc, ls, xb, eps, scale)
        t = (t0_ref[0] + i).astype(jnp.float32)
        lr = _lr_at(t, lr0, lr_total)
        loc, m1, v1 = _adam(loc, m1, v1, g_loc, t + 1.0, lr)
        ls, m2, v2 = _adam(ls, m2, v2, g_ls, t + 1.0, lr)
        losses_ref[pl.ds(i // thin, 1), :] = (-elbo).reshape(1, 1)
        return loc, ls, m1, m2, v1, v2

    out = jax.lax.fori_loop(
        0, steps, body,
        (loc_ref[...], ls_ref[...], m1_ref[...], m2_ref[...],
         v1_ref[...], v2_ref[...]))
    for r, val in zip((loc_out, ls_out, m1o, m2o, v1o, v2o), out):
        r[...] = val


@functools.partial(
    jax.jit, static_argnames=("n", "n_total", "b", "steps", "lr0",
                              "lr_total", "interpret"))
def _fused_train(x_pad, loc, ls, m1, m2, v1, v2, *, n, n_total, b, steps,
                 lr0, lr_total, seed, t0, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # thin the loss trace so its VMEM buffer stays small next to the
    # VMEM-resident dataset (the fused_linreg rule: ~100k f32 rows ~ 8 MB)
    loss_len = min(steps, 2048)
    thin = -(-steps // loss_len)
    kernel = functools.partial(_train_kernel, n=n, n_total=n_total, b=b,
                               steps=steps, lr0=lr0, lr_total=lr_total,
                               thin=thin)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    pshape = jax.ShapeDtypeStruct((1, 128), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[vmem()] * 7,
            out_specs=tuple([vmem()] * 7),
            scratch_shapes=[],
        ),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((-(-steps // thin), 1), jnp.float32)]
            + [pshape] * 6),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1),
      jnp.asarray(t0, jnp.int32).reshape(1),
      x_pad, loc, ls, m1, m2, v1, v2)
    return outs[0][:, 0], outs[1], outs[2], outs[3:]


def fused_train(x_packed, loc, ls, opt_state=None, *, steps, lr0,
                lr_total=None, seed=0, batch=1024, t0=0, n_total=None,
                interpret=False):
    """Run `steps` fused hier-logistic ELBO steps on-chip.

    x_packed: (N, 128) from pack_data, already SHUFFLED row-wise once
    (block minibatch contract).  ``n_total``: global dataset size for the
    likelihood scale when x_packed is one shard of a DP run (defaults to
    the local size).  Returns (loc, ls, opt_state, losses)."""
    n = x_packed.shape[0]
    n_total = int(n_total if n_total is not None else n)
    lr_total = int(lr_total if lr_total is not None else steps)
    if opt_state is None:
        zz = jnp.zeros((1, 128), jnp.float32)
        opt_state = (zz, zz, zz, zz)
    m1, m2, v1, v2 = opt_state
    if interpret:
        # off-TPU oracle: same math, jax.random streams
        kk = jax.random.PRNGKey(seed if np.ndim(seed) == 0 else 0)
        k1, k2 = jax.random.split(jax.random.fold_in(kk, t0))
        offs = jax.random.randint(k1, (int(steps),), 0, n)
        epss = jax.random.normal(k2, (int(steps), 1, 128))
        return reference_train(x_packed, loc, ls, (m1, m2, v1, v2),
                               off_stream=offs, eps_stream=epss,
                               lr0=lr0, lr_total=lr_total, batch=batch,
                               t0=t0, n_total=n_total)
    x_pad = jnp.concatenate([x_packed, x_packed[:batch]], axis=0)
    losses, loc, ls, (m1, m2, v1, v2) = _fused_train(
        x_pad, loc, ls, m1, m2, v1, v2, n=n, n_total=n_total,
        b=int(batch), steps=int(steps), lr0=float(lr0), lr_total=lr_total,
        seed=seed, t0=t0, interpret=False)
    return loc, ls, (m1, m2, v1, v2), losses


def reference_train(x_packed, loc, ls, opt_state, *, off_stream,
                    eps_stream, lr0, lr_total, batch, t0=0, n_total=None):
    """jnp oracle: same _step_math/_adam over injected offset/noise
    streams (parity tests; CPU path)."""
    n = x_packed.shape[0]
    n_total = int(n_total if n_total is not None else n)
    x_pad = jnp.concatenate([x_packed, x_packed[:batch]], axis=0)
    scale = n_total / batch
    m1, m2, v1, v2 = opt_state

    def step(carry, inp):
        loc, ls, m1, m2, v1, v2, t = carry
        off, eps = inp
        xb = jax.lax.dynamic_slice(x_pad, (off, 0), (batch, 128))
        elbo, g_loc, g_ls = _step_math(loc, ls, xb, eps, scale)
        lr = _lr_at(t, lr0, lr_total)
        loc, m1, v1 = _adam(loc, m1, v1, g_loc, t + 1.0, lr)
        ls, m2, v2 = _adam(ls, m2, v2, g_ls, t + 1.0, lr)
        return (loc, ls, m1, m2, v1, v2, t + 1.0), -elbo

    (loc, ls, m1, m2, v1, v2, _), losses = jax.lax.scan(
        step, (loc, ls, m1, m2, v1, v2, jnp.float32(t0)),
        (off_stream, eps_stream))
    return loc, ls, (m1, m2, v1, v2), losses
