"""Euclidean metric (mass matrix) for HMC/NUTS: kinetic energy, momentum
sampling, velocities.

Blueprint: SURVEY.md C8 — diagonal mass-matrix (Welford) adaptation is the
default; a dense metric is supported for strongly correlated posteriors.
The representation is a plain array whose rank selects the variant at trace
time (1 = diagonal inverse mass, 2 = dense inverse mass) so one code path
serves both without dynamic branching.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["kinetic_energy", "velocity", "sample_momentum", "mass_sqrt"]


def kinetic_energy(inv_mass, p):
    """0.5 * p^T M^{-1} p."""
    if inv_mass.ndim == 1:
        return 0.5 * jnp.sum(p * inv_mass * p, -1)
    return 0.5 * jnp.sum(p * (p @ inv_mass.T), -1)


def velocity(inv_mass, p):
    """dq/dt = M^{-1} p."""
    if inv_mass.ndim == 1:
        return inv_mass * p
    return p @ inv_mass.T


def mass_sqrt(inv_mass):
    """A factor S with S S^T = M, given M^{-1} (for momentum sampling).

    diag: S = 1/sqrt(inv_mass). dense: M = inv(M^{-1}); we Cholesky the
    inverse via triangular solve of L_inv = chol(M^{-1}):
    M = (L_inv^{-T})(L_inv^{-1}), so S = L_inv^{-T} works.
    """
    if inv_mass.ndim == 1:
        return jax.lax.rsqrt(inv_mass)
    l_inv = jnp.linalg.cholesky(inv_mass)
    eye = jnp.eye(inv_mass.shape[-1], dtype=inv_mass.dtype)
    return jax.scipy.linalg.solve_triangular(l_inv, eye, lower=True).T


def sample_momentum(key, inv_mass, shape_like):
    eps = jax.random.normal(key, shape_like.shape, shape_like.dtype)
    s = mass_sqrt(inv_mass)
    if inv_mass.ndim == 1:
        return s * eps
    return eps @ s.T
