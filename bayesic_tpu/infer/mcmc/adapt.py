"""Warmup adaptation: dual-averaging step size + Welford mass matrix with
Stan-style windowing.

Blueprint: SURVEY.md C8 — "dual-averaging step-size adaptation; diagonal
mass-matrix (Welford) adaptation" (BASELINE.json north_star "dual-averaging
step-size adaptation").  All states are flat pytrees of arrays so they vmap
over chains and live in ``lax.scan`` carries.

The window schedule is precomputed with *host* numpy into constant arrays
indexed by the (traced) step counter — no dynamic control flow inside the
compiled warmup loop (SURVEY.md §7: compiler-friendly control flow).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "DualAveragingState", "da_init", "da_update",
    "WelfordState", "welford_init", "welford_update", "welford_finalize",
    "build_schedule", "find_reasonable_step_size",
]


# -- dual averaging (Nesterov 2009, as used by Stan/NUTS paper) -------------

class DualAveragingState(NamedTuple):
    log_step: jax.Array
    log_step_avg: jax.Array
    grad_avg: jax.Array      # running average of (target - accept)
    t: jax.Array
    mu: jax.Array            # shrinkage target = log(10 * eps0)


def da_init(step_size):
    log_eps = jnp.log(step_size)
    zero = jnp.zeros_like(log_eps)
    return DualAveragingState(
        log_eps, zero, zero, jnp.zeros_like(log_eps),
        jnp.log(10.0) + log_eps,
    )


def da_update(state: DualAveragingState, accept_prob, target=0.8,
              gamma=0.05, t0=10.0, kappa=0.75) -> DualAveragingState:
    t = state.t + 1.0
    eta_h = 1.0 / (t + t0)
    grad_avg = (1.0 - eta_h) * state.grad_avg + eta_h * (target - accept_prob)
    log_step = state.mu - jnp.sqrt(t) / gamma * grad_avg
    eta_x = t ** (-kappa)
    log_step_avg = eta_x * log_step + (1.0 - eta_x) * state.log_step_avg
    return DualAveragingState(log_step, log_step_avg, grad_avg, t, state.mu)


# -- Welford online (co)variance -------------------------------------------

class WelfordState(NamedTuple):
    mean: jax.Array
    m2: jax.Array        # sum of squared deviations (diag: (d,), dense: (d,d))
    count: jax.Array


def welford_init(dim, dense=False, dtype=jnp.float32):
    shape = (dim, dim) if dense else (dim,)
    return WelfordState(
        jnp.zeros(dim, dtype), jnp.zeros(shape, dtype),
        jnp.zeros((), dtype),
    )


def welford_update(state: WelfordState, x) -> WelfordState:
    count = state.count + 1.0
    delta = x - state.mean
    mean = state.mean + delta / count
    delta2 = x - mean
    if state.m2.ndim == 1:
        m2 = state.m2 + delta * delta2
    else:
        m2 = state.m2 + jnp.outer(delta, delta2)
    return WelfordState(mean, m2, count)


def welford_update_batch(state: WelfordState, xs) -> WelfordState:
    """Chan-et-al parallel update with a whole batch ``xs`` (n, d) — used by
    pooled cross-chain adaptation (all chains feed ONE mass estimate)."""
    nb = xs.shape[0]
    mean_b = jnp.mean(xs, 0)
    delta_b = xs - mean_b
    if state.m2.ndim == 1:
        m2_b = jnp.sum(delta_b * delta_b, 0)
    else:
        m2_b = delta_b.T @ delta_b
    n_a = state.count
    n = n_a + nb
    delta = mean_b - state.mean
    mean = state.mean + delta * nb / n
    if state.m2.ndim == 1:
        m2 = state.m2 + m2_b + delta * delta * n_a * nb / n
    else:
        m2 = state.m2 + m2_b + jnp.outer(delta, delta) * n_a * nb / n
    return WelfordState(mean, m2, n)


def welford_finalize(state: WelfordState, regularize=True):
    """Return the *inverse mass* estimate (posterior variance, regularized
    toward identity as Stan does)."""
    var = state.m2 / jnp.maximum(state.count - 1.0, 1.0)
    if regularize:
        n = state.count
        shrink = n / (n + 5.0)
        if var.ndim == 1:
            var = shrink * var + 1e-3 * (1.0 - shrink)
        else:
            d = var.shape[-1]
            var = shrink * var + 1e-3 * (1.0 - shrink) * jnp.eye(
                d, dtype=var.dtype
            )
    return var


# -- Stan warmup windows -----------------------------------------------------

def build_schedule(num_warmup, init_buffer=75, term_buffer=50, base_window=25):
    """Host-side schedule: for each warmup step, whether we are in a slow
    (mass-estimation) window and whether this step closes a window (mass
    matrix refresh + step-size re-init).  Returns numpy bool arrays."""
    in_slow = np.zeros(num_warmup, bool)
    window_end = np.zeros(num_warmup, bool)
    if num_warmup < 20:
        return in_slow, window_end
    if init_buffer + term_buffer + base_window > num_warmup:
        init_buffer = int(0.15 * num_warmup)
        term_buffer = int(0.1 * num_warmup)
        base_window = num_warmup - init_buffer - term_buffer
    start = init_buffer
    size = base_window
    while start < num_warmup - term_buffer:
        end = min(start + size, num_warmup - term_buffer)
        # final window absorbs the remainder if the next one wouldn't fit
        if end + 2 * size > num_warmup - term_buffer:
            end = num_warmup - term_buffer
        in_slow[start:end] = True
        window_end[end - 1] = True
        start = end
        size *= 2
    return in_slow, window_end


# -- initial step-size search ------------------------------------------------

def find_reasonable_step_size(potential_and_grad, kinetic_fn, leapfrog, q,
                              key, inv_mass, init_step=1.0):
    """Double/halve the step size until the one-step acceptance crosses 0.5
    (NUTS paper, Algorithm 4)."""
    from .integrators import IntegratorState
    from .metrics import sample_momentum

    pe, grad = potential_and_grad(q)
    p = sample_momentum(key, inv_mass, q)
    h0 = pe + kinetic_fn(inv_mass, p)
    state0 = IntegratorState(q, p, pe, grad)

    def accept_at(log_eps):
        s = leapfrog(state0, jnp.exp(log_eps), inv_mass)
        h = s.pe + kinetic_fn(inv_mass, s.p)
        return h0 - h  # log accept ratio

    log_eps0 = jnp.log(init_step)
    direction = jnp.where(accept_at(log_eps0) > math.log(0.5), 1.0, -1.0)

    def cond(carry):
        log_eps, i = carry
        la = accept_at(log_eps)
        keep = jnp.where(direction > 0, la > math.log(0.5),
                         la < math.log(0.5))
        return jnp.logical_and(keep, i < 50)

    def body(carry):
        log_eps, i = carry
        return log_eps + direction * math.log(2.0), i + 1

    log_eps, _ = jax.lax.while_loop(cond, body, (log_eps0, 0))
    return jnp.exp(log_eps)
