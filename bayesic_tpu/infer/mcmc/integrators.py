"""Symplectic integrators for HMC/NUTS.

Blueprint: SURVEY.md C8 ("leapfrog integrator") and C14a (the fused-leapfrog
Pallas kernel plugs in here: ``make_leapfrog`` accepts any
``potential_and_grad`` callable, so the Pallas path swaps in transparently
with the pure-jnp closure as the correctness oracle, SURVEY.md §4.7).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax

from .metrics import velocity

__all__ = ["IntegratorState", "make_leapfrog"]


class IntegratorState(NamedTuple):
    q: jax.Array          # position (flat unconstrained params)
    p: jax.Array          # momentum
    pe: jax.Array         # potential energy = -log density
    grad: jax.Array       # d pe / d q


def make_leapfrog(potential_and_grad: Callable[[Any], Any]):
    """Velocity-Verlet step: half-kick, drift, half-kick.

    One gradient evaluation per step (the half-kicks share the cached
    endpoint gradients) — the innermost hot loop of SURVEY.md §3.2.
    """

    def step(state: IntegratorState, step_size, inv_mass) -> IntegratorState:
        p_half = state.p - 0.5 * step_size * state.grad
        q_new = state.q + step_size * velocity(inv_mass, p_half)
        pe_new, grad_new = potential_and_grad(q_new)
        p_new = p_half - 0.5 * step_size * grad_new
        return IntegratorState(q_new, p_new, pe_new, grad_new)

    return step
