"""Bijective transforms between unconstrained space R^n and distribution
supports, with log-abs-det-Jacobians.

Blueprint: SURVEY.md C2. NUTS and reparameterized SVI both operate in
unconstrained space (BASELINE.json north_star); the log-joint compiler
(SURVEY.md C4) applies ``biject_to(site.support)`` per latent site and adds the
Jacobian correction so that densities stay correct under the change of
variables.

Conventions
-----------
* ``forward(u)`` maps unconstrained -> constrained; ``inverse(x)`` the reverse.
* ``log_det_jacobian(u)`` returns ``log |det dF/du|`` with the transform's
  ``domain_event_dim`` rightmost dims reduced away, i.e. the result has shape
  ``u.shape[:u.ndim - domain_event_dim]``.
* Shape-changing transforms implement ``forward_shape``/``inverse_shape``.

All functions are pure jnp and safe under ``jit``/``vmap``/``grad``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from . import constraints

__all__ = [
    "Transform",
    "Identity",
    "Exp",
    "Softplus",
    "Sigmoid",
    "Interval",
    "Affine",
    "Ordered",
    "StickBreaking",
    "CorrCholesky",
    "LowerCholeskyTransform",
    "PositiveDefiniteTransform",
    "Chain",
    "biject_to",
]


def _softplus(x):
    return jax.nn.softplus(x)


def _log_sigmoid(x):
    return -jax.nn.softplus(-x)


class Transform:
    """Base bijector.  Every subclass is a PYTREE (VERDICT r2 item 6):
    attribute names in ``_params`` are traced leaves; everything else in
    ``__dict__`` is static aux.  Transforms also compare STRUCTURALLY
    (class + aux + param values), so a freshly built transform inside a
    jit argument's treedef hits the compilation cache instead of
    retracing — ``Exp() == Exp()`` and two ``Interval(0, 1)``s are
    interchangeable."""

    domain_event_dim: int = 0
    codomain_event_dim: int = 0
    _params: tuple = ()

    @property
    def codomain(self):
        """Constraint describing the image of ``forward``, or ``None``
        when it is the whole domain (identity/affine) — used by
        ``TransformedDistribution.support`` so transformed latents get
        the right bijector under NUTS/SVI.  A property (not an instance
        attribute) so it never pollutes the pytree aux."""
        return None

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        jax.tree_util.register_pytree_node(
            cls, cls._tree_flatten, cls._tree_unflatten
        )

    def _tree_flatten(self):
        children = tuple(getattr(self, n) for n in self._params)
        aux = tuple(
            (k, v) for k, v in sorted(self.__dict__.items())
            if k not in self._params
        )
        return children, aux

    @classmethod
    def _tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        for name, child in zip(cls._params, children):
            object.__setattr__(obj, name, child)
        for k, v in aux:
            object.__setattr__(obj, k, v)
        return obj

    def __eq__(self, other):
        """Structural equality (used when a transform lands in pytree aux
        or a jit-cache key): same class, same static aux, and per-leaf
        identity-or-value equality.  Conservatively False for tracers."""
        if type(other) is not type(self):
            return NotImplemented
        ca, aa = self._tree_flatten()
        cb, ab = other._tree_flatten()
        if aa != ab or len(ca) != len(cb):
            return False
        try:
            return all(
                (x is y) or bool(np.asarray(x == y).all())
                for x, y in zip(ca, cb)
            )
        except Exception:   # noqa: BLE001 — tracer leaves: force retrace
            return False

    def __hash__(self):
        # leaves excluded (arrays are unhashable): equal objects still
        # hash equal because aux/class dominate; value collisions only
        # cost an __eq__ call
        _, aux = self._tree_flatten()
        return hash((type(self), aux))

    def forward(self, u):
        raise NotImplementedError

    def inverse(self, x):
        raise NotImplementedError

    def log_det_jacobian(self, u):
        raise NotImplementedError

    def forward_shape(self, shape):
        return tuple(shape)

    def inverse_shape(self, shape):
        return tuple(shape)

    def __call__(self, u):
        return self.forward(u)

    def __repr__(self):
        return self.__class__.__name__ + "()"


class Identity(Transform):
    def forward(self, u):
        return u

    def inverse(self, x):
        return x

    def log_det_jacobian(self, u):
        return jnp.zeros_like(u)


class Exp(Transform):
    @property
    def codomain(self):
        return constraints.positive

    def forward(self, u):
        return jnp.exp(u)

    def inverse(self, x):
        return jnp.log(x)

    def log_det_jacobian(self, u):
        return u


class Softplus(Transform):
    @property
    def codomain(self):
        return constraints.positive

    def forward(self, u):
        return _softplus(u)

    def inverse(self, x):
        # log(e^x - 1) computed stably.
        return x + jnp.log(-jnp.expm1(-x))

    def log_det_jacobian(self, u):
        return _log_sigmoid(u)


class Sigmoid(Transform):
    @property
    def codomain(self):
        return constraints.unit_interval

    def forward(self, u):
        return jax.nn.sigmoid(u)

    def inverse(self, x):
        return jnp.log(x) - jnp.log1p(-x)

    def log_det_jacobian(self, u):
        return _log_sigmoid(u) + _log_sigmoid(-u)


class Interval(Transform):
    """R -> (low, high) via a scaled sigmoid."""

    _params = ("low", "high")

    def __init__(self, low, high):
        self.low = low
        self.high = high

    @property
    def codomain(self):
        return constraints.interval(self.low, self.high)

    def forward(self, u):
        return self.low + (self.high - self.low) * jax.nn.sigmoid(u)

    def inverse(self, x):
        z = (x - self.low) / (self.high - self.low)
        return jnp.log(z) - jnp.log1p(-z)

    def log_det_jacobian(self, u):
        return (
            jnp.log(self.high - self.low)
            + _log_sigmoid(u)
            + _log_sigmoid(-u)
        )

    def __repr__(self):
        return f"Interval({self.low}, {self.high})"


class Affine(Transform):
    _params = ("loc", "scale")

    def __init__(self, loc, scale):
        self.loc = loc
        self.scale = scale

    def forward(self, u):
        return self.loc + self.scale * u

    def inverse(self, x):
        return (x - self.loc) / self.scale

    def log_det_jacobian(self, u):
        return jnp.broadcast_to(jnp.log(jnp.abs(self.scale)), jnp.shape(u))

    def __repr__(self):
        return f"Affine(loc={self.loc}, scale={self.scale})"


class Ordered(Transform):
    """R^n -> strictly increasing vectors: x0 = u0, x_k = x_{k-1} + exp(u_k)."""

    domain_event_dim = 1
    codomain_event_dim = 1

    @property
    def codomain(self):
        return constraints.ordered

    def forward(self, u):
        first = u[..., :1]
        rest = jnp.cumsum(jnp.exp(u[..., 1:]), axis=-1)
        return jnp.concatenate([first, first + rest], axis=-1)

    def inverse(self, x):
        first = x[..., :1]
        diffs = jnp.log(x[..., 1:] - x[..., :-1])
        return jnp.concatenate([first, diffs], axis=-1)

    def log_det_jacobian(self, u):
        return jnp.sum(u[..., 1:], axis=-1)


class StickBreaking(Transform):
    """R^{K-1} -> K-simplex via the stick-breaking construction.

    z_k = sigmoid(u_k - log(K-1-k)) ; x_k = z_k * prod_{j<k}(1 - z_j);
    x_{K-1} = remainder.  The offset centers u=0 on the uniform simplex.
    """

    @property
    def codomain(self):
        return constraints.simplex

    domain_event_dim = 1
    codomain_event_dim = 1

    def forward_shape(self, shape):
        return tuple(shape[:-1]) + (shape[-1] + 1,)

    def inverse_shape(self, shape):
        return tuple(shape[:-1]) + (shape[-1] - 1,)

    def _offsets(self, k):
        # log(K-1-k) for k = 0..K-2 where K-1 = k (input dim)
        return jnp.log(jnp.arange(k, 0, -1, dtype=jnp.result_type(float)))

    def forward(self, u):
        k = u.shape[-1]
        z = jax.nn.sigmoid(u - self._offsets(k))
        # remainder_k = prod_{j<k} (1 - z_j), exclusive
        log1mz = _log_sigmoid(-(u - self._offsets(k)))
        log_rem = jnp.concatenate(
            [jnp.zeros_like(log1mz[..., :1]), jnp.cumsum(log1mz, axis=-1)],
            axis=-1,
        )
        x_head = z * jnp.exp(log_rem[..., :-1])
        x_last = jnp.exp(log_rem[..., -1:])
        return jnp.concatenate([x_head, x_last], axis=-1)

    def inverse(self, x):
        k = x.shape[-1] - 1
        rem = 1.0 - jnp.concatenate(
            [jnp.zeros_like(x[..., :1]), jnp.cumsum(x[..., :-1], axis=-1)],
            axis=-1,
        )[..., :-1]
        z = jnp.clip(x[..., :-1] / rem, 1e-30, 1.0 - 1e-7)
        return jnp.log(z) - jnp.log1p(-z) + self._offsets(k)

    def log_det_jacobian(self, u):
        k = u.shape[-1]
        t = u - self._offsets(k)
        log_z = _log_sigmoid(t)
        log1mz = _log_sigmoid(-t)
        log_rem_excl = jnp.concatenate(
            [jnp.zeros_like(log1mz[..., :1]), jnp.cumsum(log1mz[..., :-1], axis=-1)],
            axis=-1,
        )
        return jnp.sum(log_z + log1mz + log_rem_excl, axis=-1)


def _vec_to_tril_dim(n):
    # n = m(m-1)/2  ->  m
    m = int((1.0 + math.sqrt(1.0 + 8.0 * n)) / 2.0)
    assert m * (m - 1) // 2 == n, f"bad corr-cholesky vec length {n}"
    return m


class CorrCholesky(Transform):
    """R^{m(m-1)/2} -> Cholesky factor of a correlation matrix.

    Strict lower triangle is filled with tanh(u); each row is then
    stick-broken on its squared norm so rows have unit norm and positive
    diagonal (the Stan/canonical construction).
    """

    @property
    def codomain(self):
        return constraints.corr_cholesky

    domain_event_dim = 1
    codomain_event_dim = 2

    def forward_shape(self, shape):
        m = _vec_to_tril_dim(shape[-1])
        return tuple(shape[:-1]) + (m, m)

    def inverse_shape(self, shape):
        m = shape[-1]
        return tuple(shape[:-2]) + (m * (m - 1) // 2,)

    def _tmat(self, u):
        m = _vec_to_tril_dim(u.shape[-1])
        idx = jnp.tril_indices(m, -1)
        t = jnp.zeros(u.shape[:-1] + (m, m), u.dtype)
        return t.at[..., idx[0], idx[1]].set(jnp.tanh(u)), m

    def forward(self, u):
        t, m = self._tmat(u)
        # s_ij = prod_{k<j} (1 - t_ik^2)  (exclusive cumprod per row; t is zero
        # off the strict lower triangle so the cumprod is globally valid)
        one_minus_t2 = 1.0 - t * t
        s = jnp.concatenate(
            [
                jnp.ones_like(one_minus_t2[..., :, :1]),
                jnp.cumprod(one_minus_t2[..., :, :-1], axis=-1),
            ],
            axis=-1,
        )
        tril_mask = jnp.tril(jnp.ones((m, m), bool), -1)
        l = jnp.where(tril_mask, t * jnp.sqrt(s), 0.0)
        rng = jnp.arange(m)
        diag = jnp.sqrt(s[..., rng, rng])
        return l.at[..., rng, rng].set(diag)

    def inverse(self, x):
        m = x.shape[-1]
        sq = x * x
        s = 1.0 - jnp.concatenate(
            [jnp.zeros_like(sq[..., :, :1]), jnp.cumsum(sq[..., :, :-1], axis=-1)],
            axis=-1,
        )
        t = x / jnp.sqrt(jnp.clip(s, 1e-30))
        idx = jnp.tril_indices(m, -1)
        return jnp.arctanh(jnp.clip(t[..., idx[0], idx[1]], -1 + 1e-7, 1 - 1e-7))

    def log_det_jacobian(self, u):
        t, m = self._tmat(u)
        # log(1-t^2) is exactly 0 off the strict lower triangle (t==0 there),
        # so the per-row exclusive cumsum gives log s_ij everywhere we need it.
        log1mt2 = jnp.log(jnp.clip(1.0 - t * t, 1e-30))
        log_s = jnp.concatenate(
            [
                jnp.zeros_like(log1mt2[..., :, :1]),
                jnp.cumsum(log1mt2[..., :, :-1], axis=-1),
            ],
            axis=-1,
        )
        tril_mask = jnp.tril(jnp.ones((m, m), bool), -1)
        per_entry = jnp.where(tril_mask, log1mt2 + 0.5 * log_s, 0.0)
        return jnp.sum(per_entry, axis=(-2, -1))


class LowerCholeskyTransform(Transform):
    """R^{m(m+1)/2} -> lower-triangular with positive (exp'd) diagonal."""

    @property
    def codomain(self):
        return constraints.lower_cholesky

    domain_event_dim = 1
    codomain_event_dim = 2

    def forward_shape(self, shape):
        n = shape[-1]
        m = int((-1.0 + math.sqrt(1.0 + 8.0 * n)) / 2.0)
        assert m * (m + 1) // 2 == n
        return tuple(shape[:-1]) + (m, m)

    def inverse_shape(self, shape):
        m = shape[-1]
        return tuple(shape[:-2]) + (m * (m + 1) // 2,)

    def forward(self, u):
        n = u.shape[-1]
        m = int((-1.0 + math.sqrt(1.0 + 8.0 * n)) / 2.0)
        idx = jnp.tril_indices(m)
        mat = jnp.zeros(u.shape[:-1] + (m, m), u.dtype).at[..., idx[0], idx[1]].set(u)
        diag = jnp.diagonal(mat, axis1=-2, axis2=-1)
        return mat.at[..., jnp.arange(m), jnp.arange(m)].set(jnp.exp(diag))

    def inverse(self, x):
        m = x.shape[-1]
        diag = jnp.log(jnp.diagonal(x, axis1=-2, axis2=-1))
        mat = x.at[..., jnp.arange(m), jnp.arange(m)].set(diag)
        idx = jnp.tril_indices(m)
        return mat[..., idx[0], idx[1]]

    def log_det_jacobian(self, u):
        n = u.shape[-1]
        m = int((-1.0 + math.sqrt(1.0 + 8.0 * n)) / 2.0)
        # diagonal entries sit at vec positions k(k+1)/2 + k
        pos = jnp.array([k * (k + 1) // 2 + k for k in range(m)])
        return jnp.sum(u[..., pos], axis=-1)


class PositiveDefiniteTransform(Transform):
    """R^{m(m+1)/2} -> symmetric positive-definite, via W = L L^T with L the
    LowerCholeskyTransform image.  The log-det adds the Jacobian of the
    outer-product map on lower-triangular coordinates,
    ``|det dW/dL| = 2^m prod_i L_ii^{m-i+1}`` (i 1-based), to the
    lower-Cholesky ldj — both reduce to linear functions of the diagonal
    coordinates of ``u``."""

    domain_event_dim = 1
    codomain_event_dim = 2

    def __init__(self):
        self._chol = LowerCholeskyTransform()

    @property
    def codomain(self):
        return constraints.positive_definite

    def forward_shape(self, shape):
        return self._chol.forward_shape(shape)

    def inverse_shape(self, shape):
        return self._chol.inverse_shape(shape)

    def forward(self, u):
        tril = self._chol.forward(u)
        return tril @ jnp.swapaxes(tril, -1, -2)

    def inverse(self, x):
        return self._chol.inverse(jnp.linalg.cholesky(x))

    def log_det_jacobian(self, u):
        n = u.shape[-1]
        m = int((-1.0 + math.sqrt(1.0 + 8.0 * n)) / 2.0)
        pos = jnp.array([k * (k + 1) // 2 + k for k in range(m)])
        # lower-chol ldj: sum_i u_ii; outer-product ldj: m log 2 +
        # sum_i (m - i + 1) log L_ii with log L_ii = u_ii
        weights = jnp.arange(m, 0, -1, dtype=u.dtype) + 1.0
        return m * math.log(2.0) + jnp.sum(weights * u[..., pos], axis=-1)


class Chain(Transform):
    """Compose transforms: forward applies left-to-right."""

    @property
    def codomain(self):
        return self.parts[-1].codomain if self.parts else None

    _params = ("parts",)

    def __init__(self, *parts):
        self.parts = parts
        self.domain_event_dim = max(
            (p.domain_event_dim for p in parts), default=0
        )
        self.codomain_event_dim = max(
            (p.codomain_event_dim for p in parts), default=0
        )

    def forward(self, u):
        for p in self.parts:
            u = p.forward(u)
        return u

    def inverse(self, x):
        for p in reversed(self.parts):
            x = p.inverse(x)
        return x

    def log_det_jacobian(self, u):
        total = 0.0
        for p in self.parts:
            ldj = p.log_det_jacobian(u)
            reduce_dims = self.domain_event_dim - p.domain_event_dim
            if reduce_dims > 0:
                ldj = jnp.sum(ldj, axis=tuple(range(-reduce_dims, 0)))
            total = total + ldj
            u = p.forward(u)
        return total

    def forward_shape(self, shape):
        for p in self.parts:
            shape = p.forward_shape(shape)
        return shape

    def inverse_shape(self, shape):
        for p in reversed(self.parts):
            shape = p.inverse_shape(shape)
        return shape


def biject_to(constraint):
    """Map a Constraint to a Transform from unconstrained space onto it.

    SURVEY.md C2: the single registry the log-joint compiler (C4) consults.
    """
    c = constraints
    if isinstance(constraint, c._Real) or isinstance(constraint, c._RealVector):
        return Identity()
    if isinstance(constraint, (c._Positive, c._Nonnegative)):
        return Exp()
    if isinstance(constraint, c._GreaterThan):
        return Chain(Exp(), Affine(constraint.low, 1.0))
    if isinstance(constraint, c._UnitInterval):
        return Sigmoid()
    if isinstance(constraint, c._Interval):
        return Interval(constraint.low, constraint.high)
    if isinstance(constraint, c._Simplex):
        return StickBreaking()
    if isinstance(constraint, c._Ordered):
        return Ordered()
    if isinstance(constraint, c._CorrCholesky):
        return CorrCholesky()
    if isinstance(constraint, c._LowerCholesky):
        return LowerCholeskyTransform()
    if isinstance(constraint, c._RealMatrix):
        return Identity()
    if isinstance(constraint, c._PositiveDefinite):
        return PositiveDefiniteTransform()
    raise ValueError(
        f"No bijector for constraint {constraint!r} "
        f"(discrete constraints cannot be latent sites)."
    )
