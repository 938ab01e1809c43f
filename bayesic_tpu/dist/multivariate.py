"""Multivariate families: MultivariateNormal, Dirichlet, LKJCholesky.

Blueprint: SURVEY.md C1 — MVN (full-rank via Cholesky) backs the full-rank
Gaussian guide (C6); Dirichlet/LKJ back mixture weights and hierarchical
correlation priors.  All linear algebra is Cholesky-based (triangular solves,
no explicit inverses) so XLA lowers it to MXU-friendly batched triangular ops.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular
from jax.scipy.special import gammaln

from . import constraints
from .distribution import Distribution

__all__ = ["MultivariateNormal", "Dirichlet", "LKJCholesky"]

_LOG_2PI = math.log(2.0 * math.pi)


class MultivariateNormal(Distribution):
    """MVN parameterized by ``loc`` and lower-Cholesky ``scale_tril``
    (or ``covariance_matrix``, factorized once at construction)."""

    _params = ("loc", "scale_tril")
    support = constraints.real_vector

    def __init__(self, loc, scale_tril=None, covariance_matrix=None):
        if (scale_tril is None) == (covariance_matrix is None):
            raise ValueError("pass exactly one of scale_tril/covariance_matrix")
        if scale_tril is None:
            scale_tril = jnp.linalg.cholesky(covariance_matrix)
        self.loc = jnp.asarray(loc)
        self.scale_tril = jnp.asarray(scale_tril)
        d = self.scale_tril.shape[-1]
        batch = jax.lax.broadcast_shapes(
            self.loc.shape[:-1], self.scale_tril.shape[:-2]
        )
        super().__init__(batch, (d,))

    _param_event_ndims = {"loc": 1, "scale_tril": 2}

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape + self.event_shape
        eps = jax.random.normal(key, shape, jnp.result_type(float))
        return self.loc + jnp.einsum("...ij,...j->...i", self.scale_tril, eps)

    def log_prob(self, x):
        diff = x - self.loc
        # Solve L z = diff (jax's solve_triangular does not broadcast batch
        # dims, so broadcast explicitly first)
        batch = jax.lax.broadcast_shapes(
            diff.shape[:-1], self.scale_tril.shape[:-2]
        )
        tril = jnp.broadcast_to(
            self.scale_tril, batch + self.scale_tril.shape[-2:]
        )
        diff = jnp.broadcast_to(diff, batch + diff.shape[-1:])
        z = solve_triangular(tril, diff[..., None], lower=True)[..., 0]
        half_log_det = jnp.sum(
            jnp.log(jnp.diagonal(self.scale_tril, axis1=-2, axis2=-1)), -1
        )
        d = self.event_shape[0]
        return (
            -0.5 * jnp.sum(z * z, -1) - half_log_det - 0.5 * d * _LOG_2PI
        )

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape + self.event_shape)

    @property
    def covariance(self):
        return jnp.einsum(
            "...ij,...kj->...ik", self.scale_tril, self.scale_tril
        )

    @property
    def variance(self):
        return jnp.sum(jnp.square(self.scale_tril), axis=-1)

    def entropy(self):
        d = self.event_shape[0]
        half_log_det = jnp.sum(
            jnp.log(jnp.diagonal(self.scale_tril, axis1=-2, axis2=-1)), -1
        )
        return 0.5 * d * (1.0 + _LOG_2PI) + half_log_det


class Dirichlet(Distribution):
    _params = ("concentration",)
    support = constraints.simplex

    def __init__(self, concentration):
        self.concentration = jnp.asarray(concentration)
        super().__init__(
            self.concentration.shape[:-1], self.concentration.shape[-1:]
        )

    _param_event_ndims = {"concentration": 1}

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        conc = jnp.broadcast_to(
            self.concentration, shape + self.event_shape
        )
        return jax.random.dirichlet(key, conc, dtype=jnp.result_type(float))

    def log_prob(self, x):
        a = self.concentration
        return (
            jnp.sum((a - 1.0) * jnp.log(x), -1)
            + gammaln(jnp.sum(a, -1))
            - jnp.sum(gammaln(a), -1)
        )

    @property
    def mean(self):
        return self.concentration / jnp.sum(
            self.concentration, -1, keepdims=True
        )

    @property
    def variance(self):
        a = self.concentration
        a0 = jnp.sum(a, -1, keepdims=True)
        m = a / a0
        return m * (1.0 - m) / (a0 + 1.0)


class LKJCholesky(Distribution):
    """LKJ prior over Cholesky factors of correlation matrices.

    Density over the strict-lower-triangular coordinates of ``L``:
    ``p(L) ∝ prod_{i=2..d} L_ii^(d - i + 2*eta - 2)`` with the standard
    closed-form normalizer; samples drawn by the (vectorized) onion method.
    """

    _params = ("concentration",)
    support = constraints.corr_cholesky
    reparametrized = False

    def __init__(self, dimension, concentration=1.0):
        self.dimension = int(dimension)
        self.concentration = jnp.asarray(concentration)
        super().__init__(
            self.concentration.shape, (self.dimension, self.dimension)
        )

    def sample(self, key, sample_shape=()):
        d = self.dimension
        shape = tuple(sample_shape) + self.batch_shape
        eta = jnp.broadcast_to(self.concentration, shape)
        key_z, key_y = jax.random.split(key)
        ftype = jnp.result_type(float)

        # Row directions: normalize strict-lower gaussian rows.
        z = jax.random.normal(key_z, shape + (d, d), ftype)
        tril_mask = jnp.tril(jnp.ones((d, d), bool), -1)
        z = jnp.where(tril_mask, z, 0.0)
        norm = jnp.sqrt(jnp.sum(z * z, -1, keepdims=True))
        u = jnp.where(tril_mask, z / jnp.clip(norm, 1e-30), 0.0)

        # Squared radii y_k ~ Beta(k/2, eta + (d-1-k)/2) for rows k=1..d-1.
        k = jnp.arange(1, d, dtype=ftype)
        a = 0.5 * k
        b = eta[..., None] + 0.5 * (d - 1 - k)
        y = jax.random.beta(
            key_y, jnp.broadcast_to(a, shape + (d - 1,)),
            jnp.broadcast_to(b, shape + (d - 1,)), dtype=ftype,
        )

        rows = jnp.concatenate(
            [jnp.zeros(shape + (1,), ftype), y], axis=-1
        )  # row 0 has radius 0 (identity row)
        lower = u * jnp.sqrt(rows)[..., None]
        diag = jnp.sqrt(1.0 - rows)
        rng = jnp.arange(d)
        return lower.at[..., rng, rng].set(diag)

    def log_prob(self, x):
        d = self.dimension
        eta = self.concentration
        diag = jnp.diagonal(x, axis1=-2, axis2=-1)[..., 1:]
        order = jnp.arange(2, d + 1, dtype=jnp.result_type(float))
        unnorm = jnp.sum((d - order + 2.0 * eta[..., None] - 2.0)
                         * jnp.log(diag), -1)
        # log normalizer of the LKJ density over R, with the L->R Jacobian
        # folded in (the exponent above already absorbs it).
        k = jnp.arange(1, d, dtype=jnp.result_type(float))
        log_c = jnp.sum(
            0.5 * k * math.log(math.pi)
            + gammaln(eta[..., None] + 0.5 * (d - 1 - k))
            - gammaln(eta[..., None] + 0.5 * (d - 1)),
            -1,
        )
        return unnorm - log_c
