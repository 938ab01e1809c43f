"""Support constraints for distributions.

Blueprint: SURVEY.md C2 (transforms/bijectors need constraint metadata so the
log-joint compiler, SURVEY.md C4, can move every latent site to unconstrained
space for NUTS/SVI; BASELINE.json north_star "reparameterized").

A ``Constraint`` describes the support of a distribution.  ``biject_to`` (in
``transforms.py``) maps each constraint to a bijector onto R^n.  Discrete
constraints have no bijector; discrete sites can only be observed or
enumerated/marginalised by hand.
"""

from __future__ import annotations

import jax.numpy as jnp


class Constraint:
    """Base constraint. ``event_dim`` is the number of rightmost dims that
    form one event of the constrained value."""

    event_dim: int = 0
    is_discrete: bool = False

    def __call__(self, x):
        raise NotImplementedError

    def __repr__(self):
        return self.__class__.__name__.lstrip("_") + "()"


class _Real(Constraint):
    def __call__(self, x):
        return jnp.isfinite(x)


class _RealVector(Constraint):
    event_dim = 1

    def __call__(self, x):
        return jnp.all(jnp.isfinite(x), axis=-1)


class _Positive(Constraint):
    def __call__(self, x):
        return x > 0


class _Nonnegative(Constraint):
    def __call__(self, x):
        return x >= 0


class _UnitInterval(Constraint):
    def __call__(self, x):
        return (x >= 0) & (x <= 1)


class _Interval(Constraint):
    def __init__(self, low, high):
        self.low = low
        self.high = high

    def __call__(self, x):
        return (x >= self.low) & (x <= self.high)

    def __repr__(self):
        return f"Interval({self.low}, {self.high})"


class _GreaterThan(Constraint):
    def __init__(self, low):
        self.low = low

    def __call__(self, x):
        return x > self.low

    def __repr__(self):
        return f"GreaterThan({self.low})"


class _Simplex(Constraint):
    event_dim = 1

    def __call__(self, x):
        return jnp.all(x >= 0, axis=-1) & (jnp.abs(x.sum(-1) - 1.0) < 1e-6)


class _Ordered(Constraint):
    event_dim = 1

    def __call__(self, x):
        return jnp.all(x[..., 1:] > x[..., :-1], axis=-1)


class _CorrCholesky(Constraint):
    """Lower-triangular with positive diagonal and unit-norm rows."""

    event_dim = 2

    def __call__(self, x):
        tril = jnp.all(jnp.triu(x, 1) == 0, axis=(-2, -1))
        pos_diag = jnp.all(jnp.diagonal(x, axis1=-2, axis2=-1) > 0, axis=-1)
        unit_row = jnp.all(
            jnp.abs(jnp.sum(x * x, axis=-1) - 1.0) < 1e-5, axis=-1
        )
        return tril & pos_diag & unit_row


class _LowerCholesky(Constraint):
    event_dim = 2

    def __call__(self, x):
        tril = jnp.all(jnp.triu(x, 1) == 0, axis=(-2, -1))
        pos_diag = jnp.all(jnp.diagonal(x, axis1=-2, axis2=-1) > 0, axis=-1)
        return tril & pos_diag


class _RealMatrix(Constraint):
    event_dim = 2

    def __call__(self, x):
        return jnp.all(jnp.isfinite(x), axis=(-2, -1))


class _PositiveDefinite(Constraint):
    """Symmetric positive-definite matrices."""

    event_dim = 2

    def __call__(self, x):
        # RELATIVE symmetry tolerance: an absolute 1e-5 rejects
        # well-conditioned SPD matrices of large scale (entries ~1e6 are
        # symmetric only to ~1e-2 in f32) and accepts meaningfully
        # asymmetric tiny ones
        xt = jnp.swapaxes(x, -1, -2)
        sym = jnp.all(jnp.abs(x - xt) <= 1e-5 * (1.0 + jnp.abs(x)),
                      axis=(-2, -1))
        # cholesky of a non-PD matrix yields NaNs
        chol_ok = jnp.all(jnp.isfinite(jnp.linalg.cholesky(x)),
                          axis=(-2, -1))
        return sym & chol_ok


class _Boolean(Constraint):
    is_discrete = True

    def __call__(self, x):
        return (x == 0) | (x == 1)


class _NonnegativeInteger(Constraint):
    is_discrete = True

    def __call__(self, x):
        return (x >= 0) & (x == jnp.floor(x))


class _IntegerInterval(Constraint):
    is_discrete = True

    def __init__(self, low, high):
        self.low = low
        self.high = high

    def __call__(self, x):
        return (x >= self.low) & (x <= self.high) & (x == jnp.floor(x))

    def __repr__(self):
        return f"IntegerInterval({self.low}, {self.high})"


real = _Real()
real_vector = _RealVector()
positive = _Positive()
nonnegative = _Nonnegative()
unit_interval = _UnitInterval()
simplex = _Simplex()
ordered = _Ordered()
corr_cholesky = _CorrCholesky()
lower_cholesky = _LowerCholesky()
real_matrix = _RealMatrix()
positive_definite = _PositiveDefinite()
boolean = _Boolean()
nonnegative_integer = _NonnegativeInteger()
interval = _Interval
greater_than = _GreaterThan
integer_interval = _IntegerInterval
