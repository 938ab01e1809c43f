"""Fused leapfrog update kernels (SURVEY.md C14a).

A leapfrog step is (half-kick, drift) -> gradient eval -> (half-kick).  The
gradient is model-specific XLA code, so the fusable parts are the two
elementwise phases; this module provides them as Pallas kernels operating on
(chains, dim) blocks with diagonal inverse mass, behind the
``BAYESIC_PALLAS`` flag with pure-jnp fallbacks (SURVEY.md §4.7 parity).

Honest perf note (SURVEY.md §7 / PR7 rule: "adopt only where the profiler
shows XLA fusion actually falls short"): inside a jitted NUTS while_loop XLA
already fuses these elementwise phases into neighbouring kernels, so the
Pallas path matters mainly when the integrator is driven outside a fused
loop (e.g. the SMC mutation sweep over a huge particle batch, where one
kernel per phase replaces several).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = ["kick_drift", "kick", "kick_drift_reference", "kick_reference"]

_BC = 256   # chain-block (sublanes)


def kick_drift_reference(q, p, grad, step_size, inv_mass):
    """p_half = p - eps/2 * grad;  q_new = q + eps * inv_mass * p_half."""
    p_half = p - 0.5 * step_size * grad
    return q + step_size * inv_mass * p_half, p_half


def kick_reference(p_half, grad_new, step_size):
    return p_half - 0.5 * step_size * grad_new


def _use_pallas():
    flag = os.environ.get("BAYESIC_PALLAS", "auto")
    if flag == "0":
        return False, False
    if flag == "interpret":
        return True, True
    on_tpu = jax.default_backend() == "tpu"
    if flag == "1":
        return True, not on_tpu
    return on_tpu, False


def _kick_drift_kernel(q_ref, p_ref, g_ref, eps_ref, minv_ref, qo_ref,
                       po_ref):
    eps = eps_ref[...]          # (BC, 1) per-chain step size
    p_half = p_ref[...] - 0.5 * eps * g_ref[...]
    qo_ref[...] = q_ref[...] + eps * minv_ref[...] * p_half
    po_ref[...] = p_half


def kick_drift(q, p, grad, step_size, inv_mass):
    """Batched fused half-kick + drift.  q/p/grad: (C, dim); step_size (C,)
    or scalar; inv_mass (dim,) or (C, dim)."""
    use, interp = _use_pallas()
    c, d = q.shape
    eps = jnp.broadcast_to(jnp.asarray(step_size)[..., None], (c, 1))
    minv = jnp.broadcast_to(inv_mass, (c, d))
    if not use or c % _BC != 0 or d % 128 != 0:
        return kick_drift_reference(q, p, grad, eps, minv)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = pl.BlockSpec((_BC, d), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    eps_spec = pl.BlockSpec((_BC, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    qo, po = pl.pallas_call(
        _kick_drift_kernel,
        grid=(c // _BC,),
        in_specs=[spec, spec, spec, eps_spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((c, d), q.dtype),
                   jax.ShapeDtypeStruct((c, d), q.dtype)),
        interpret=interp,
    )(q, p, grad, eps, minv)
    return qo, po


def kick(p_half, grad_new, step_size):
    use, interp = _use_pallas()
    c, d = p_half.shape
    eps = jnp.broadcast_to(jnp.asarray(step_size)[..., None], (c, 1))
    if not use or c % _BC != 0 or d % 128 != 0:
        return kick_reference(p_half, grad_new, eps)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = pl.BlockSpec((_BC, d), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    eps_spec = pl.BlockSpec((_BC, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def kern(p_ref, g_ref, e_ref, o_ref):
        o_ref[...] = p_ref[...] - 0.5 * e_ref[...] * g_ref[...]

    return pl.pallas_call(
        kern,
        grid=(c // _BC,),
        in_specs=[spec, spec, eps_spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((c, d), p_half.dtype),
        interpret=interp,
    )(p_half, grad_new, eps)
