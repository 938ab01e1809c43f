"""Whole-run fused trainer for the Bayesian linear-regression workload.

Blueprint: third application of the `ops/fused_vae.py` recipe (BASELINE
configs[0], SURVEY.md C16).  The XLA path is HBM-bandwidth bound: every
step re-streams the (N, D) design matrix from HBM (~30% HBM utilization
measured).  Holding X in VMEM for the whole run removes ALL per-step HBM
traffic and launch overhead: each step is two (N, 128) MXU matvecs plus
(1, 128) elementwise math.

Layout — one (N, 128) matrix: cols 0..D-1 = x, col D = 1 (bias), col
D+1 = y.  Guide lanes ALIGN with data columns: lanes 0..D-1 = w, lane D =
b — so the predicted mean is one matvec `Xb @ (z*sel)` with no selector
matrices.  Model (known noise s): w,b ~ N(0,1); y ~ N(Xw + b, s).
Mean-field STL ELBO, Adam + cosine decay, on-core PRNG — the
`fused_hier` contract (same `_adam`/`_lr_at`/PRNG helpers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .fused_hier import _adam, _lr_at, _normal, _uniform  # noqa: F401

_C = 0.5 * float(np.log(2.0 * np.pi))


def pack_data(x, y):
    n, d = x.shape
    assert d + 2 <= 128
    out = np.zeros((n, 128), np.float32)
    out[:, :d] = np.asarray(x, np.float32)
    out[:, d] = 1.0
    out[:, d + 1] = np.asarray(y, np.float32)
    return jnp.asarray(out)


def pack_params(d, init_scale=0.1):
    loc = jnp.zeros((1, 128), jnp.float32)
    ls = jnp.asarray(
        np.where(np.arange(128) < d + 1, np.log(init_scale), 0.0)
        .reshape(1, 128), jnp.float32)
    return loc, ls


def unpack_stats(loc, ls, d):
    loc = np.asarray(loc)[0]
    sd = np.exp(np.asarray(ls)[0])
    return ({"w": loc[:d], "b": loc[d]}, {"w": sd[:d], "b": sd[d]})


def _sel(d):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    mask = (lane <= d).astype(jnp.float32)           # w lanes + bias lane
    col = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    e_y = (col == d + 1).astype(jnp.float32)
    return mask, e_y


def gram(x_packed):
    """G = P^T P over the packed (N, 128) matrix — the sufficient statistic
    of the Gaussian likelihood.  The residual is r = P (z - e_y), so
    sum r^2 = (z - e_y)^T G (z - e_y) EXACTLY: each ELBO step needs one
    (1, 128) x (128, 128) matmul instead of two full passes over the data.
    f64 accumulation: the N-row inner products lose digits in f32 and the
    residual quadratic form is a difference of large terms."""
    xp = np.asarray(x_packed, np.float64)
    return jnp.asarray(xp.T @ xp, jnp.float32)


def _step_math(loc, ls, g_mat, n, eps, d, noise):
    """Full-batch STL ELBO + hand-derived gradients from the Gram matrix
    ``g_mat = gram(x_packed)`` (exact sufficient statistics)."""
    mask, e_y = _sel(d)
    dot = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32)
    mm = lambda a, b: dot(a, b, (((1,), (0,)), ((), ())))      # noqa: E731

    inv_s2 = 1.0 / (noise * noise)
    e_ls = jnp.exp(ls * mask) * mask
    z = (loc + e_ls * eps) * mask                     # (1, 128)

    u = z - e_y.T                                     # residual coefficients
    gu = mm(u, g_mat)                                 # (1, 128)
    sum_r2 = jnp.sum(u * gu)

    ll = -0.5 * inv_s2 * sum_r2 - n * (jnp.log(noise) + _C)
    lp = jnp.sum((-0.5 * z * z - _C) * mask)
    logq = jnp.sum((-ls - 0.5 * eps * eps - _C) * mask)
    elbo = ll + lp - logq

    g_z = (-inv_s2) * gu                              # d ll / d z (G sym.)
    g_z = (g_z - z + eps * jnp.exp(-ls * mask)) * mask
    g_loc = g_z
    g_ls = g_z * eps * e_ls
    return elbo, g_loc, g_ls


def _train_kernel(seed_ref, t0_ref, x_ref, loc_ref, ls_ref,
                  m1_ref, m2_ref, v1_ref, v2_ref,
                  losses_ref, loc_out, ls_out, m1o, m2o, v1o, v2o,
                  *, d, noise, n, steps, lr0, lr_total, thin):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(seed_ref[0])
    g_mat = x_ref[...]                                # (128, 128) Gram

    def body(i, carry):
        loc, ls, m1, m2, v1, v2 = carry
        eps = _normal((8, 128))[0:1, :]
        elbo, g_loc, g_ls = _step_math(loc, ls, g_mat, n, eps, d, noise)
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
    jax.jit, static_argnames=("d", "noise", "n", "steps", "lr0",
                              "lr_total", "interpret"))
def _fused_train(g_mat, loc, ls, m1, m2, v1, v2, *, d, noise, n, steps,
                 lr0, lr_total, seed, t0, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # the loss trace is thinned so its VMEM buffer stays small: 100k f32
    # rows sublane/lane-pad to ~8 MB, which OOMed scoped vmem next to an
    # 8 MB VMEM-resident design matrix (seen on v5e)
    loss_len = min(steps, 2048)
    thin = -(-steps // loss_len)
    kernel = functools.partial(_train_kernel, d=d, noise=noise, n=n,
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
      g_mat, loc, ls, m1, m2, v1, v2)
    return outs[0][:, 0], outs[1], outs[2], outs[3:]


def fused_train(x_packed, d, noise, loc, ls, opt_state=None, *, steps,
                lr0, lr_total=None, seed=0, t0=0, interpret=False):
    """Run `steps` fused full-batch linreg ELBO steps on-chip.
    Returns (loc, ls, opt_state, losses)."""
    lr_total = int(lr_total if lr_total is not None else steps)
    if opt_state is None:
        zz = jnp.zeros((1, 128), jnp.float32)
        opt_state = (zz, zz, zz, zz)
    m1, m2, v1, v2 = opt_state
    if interpret:
        kk = jax.random.PRNGKey(seed if np.ndim(seed) == 0 else 0)
        eps = jax.random.normal(jax.random.fold_in(kk, t0),
                                (int(steps), 1, 128))
        return reference_train(x_packed, d, noise, loc, ls,
                               (m1, m2, v1, v2), eps_stream=eps, lr0=lr0,
                               lr_total=lr_total, t0=t0)
    losses, loc, ls, (m1, m2, v1, v2) = _fused_train(
        gram(x_packed), loc, ls, m1, m2, v1, v2, d=int(d),
        noise=float(noise), n=int(x_packed.shape[0]), steps=int(steps),
        lr0=float(lr0), lr_total=lr_total, seed=seed, t0=t0,
        interpret=False)
    return loc, ls, (m1, m2, v1, v2), losses


def reference_train(x_packed, d, noise, loc, ls, opt_state, *, eps_stream,
                    lr0, lr_total, t0=0):
    m1, m2, v1, v2 = opt_state

    n = x_packed.shape[0]
    g_mat = gram(x_packed)

    def step(carry, eps):
        loc, ls, m1, m2, v1, v2, t = carry
        elbo, g_loc, g_ls = _step_math(loc, ls, g_mat, n, eps, d, noise)
        lr = _lr_at(t, lr0, lr_total)
        loc, m1, v1 = _adam(loc, m1, v1, g_loc, t + 1.0, lr)
        ls, m2, v2 = _adam(ls, m2, v2, g_ls, t + 1.0, lr)
        return (loc, ls, m1, m2, v1, v2, t + 1.0), -elbo

    (loc, ls, m1, m2, v1, v2, _), losses = jax.lax.scan(
        step, (loc, ls, m1, m2, v1, v2, jnp.float32(t0)), eps_stream)
    return loc, ls, (m1, m2, v1, v2), losses
