"""Compound / overdispersed count families and circular + random-walk
distributions.

Blueprint: SURVEY.md C1 — rounding out the library with the standard
conjugate-compound count models (Beta-Binomial, Dirichlet-Multinomial),
zero-inflation (a generic gate applied to any count base), the circular
von Mises, and the GaussianRandomWalk prior used by state-space models.
All densities are closed-form elementwise jnp (XLA-fusable); the one
rejection sampler (von Mises, Best & Fisher 1979) runs a fixed number of
vectorized proposal rounds so shapes stay static under jit.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import betaln, gammaln, i0e

from . import constraints
from .distribution import Distribution

__all__ = ["BetaBinomial", "Censored", "DirichletMultinomial",
           "GaussianRandomWalk", "Truncated",
           "VonMises", "ZeroInflatedDistribution", "ZeroInflatedPoisson",
           "ZeroInflatedNegativeBinomial"]


def _bshape(*args):
    return jax.lax.broadcast_shapes(*(jnp.shape(a) for a in args))


class BetaBinomial(Distribution):
    """K ~ Binomial(n, p) with p ~ Beta(a, b) marginalised:
    P(k) = C(n,k) B(k+a, n-k+b) / B(a, b)."""

    _params = ("concentration1", "concentration0", "total_count")
    support = constraints.nonnegative_integer
    reparametrized = False

    def __init__(self, concentration1, concentration0, total_count):
        self.concentration1 = jnp.asarray(concentration1)
        self.concentration0 = jnp.asarray(concentration0)
        self.total_count = jnp.asarray(total_count)
        super().__init__(_bshape(self.concentration1, self.concentration0,
                                 self.total_count))

    def sample(self, key, sample_shape=()):
        k1, k2 = jax.random.split(key)
        shape = self.shape(sample_shape)
        a = jnp.broadcast_to(self.concentration1, shape)
        b = jnp.broadcast_to(self.concentration0, shape)
        p = jax.random.beta(k1, a, b)
        n = jnp.broadcast_to(self.total_count, shape)
        return jax.random.binomial(k2, n.astype(jnp.float32), p).astype(
            jnp.int32)

    def log_prob(self, x):
        n, a, b = self.total_count, self.concentration1, self.concentration0
        log_comb = gammaln(n + 1.0) - gammaln(x + 1.0) - gammaln(n - x + 1.0)
        return log_comb + betaln(x + a, n - x + b) - betaln(a, b)

    @property
    def mean(self):
        a, b = self.concentration1, self.concentration0
        return self.total_count * a / (a + b)

    @property
    def variance(self):
        a, b = self.concentration1, self.concentration0
        n, s = self.total_count, self.concentration1 + self.concentration0
        return n * a * b * (n + s) / (s * s * (s + 1.0))


class DirichletMultinomial(Distribution):
    """counts ~ Multinomial(n, p) with p ~ Dirichlet(alpha) marginalised."""

    _params = ("concentration", "total_count")
    _param_event_ndims = {"concentration": 1}
    reparametrized = False

    def __init__(self, concentration, total_count):
        self.concentration = jnp.asarray(concentration)
        self.total_count = jnp.asarray(total_count)
        super().__init__(
            _bshape(self.concentration[..., 0], self.total_count),
            self.concentration.shape[-1:])

    @property
    def support(self):
        return constraints.nonnegative_integer

    def sample(self, key, sample_shape=()):
        """Dirichlet draw then a chain of conditional binomials — works
        for batched AND traced total_count (r2 review: routing through
        Multinomial crashed on both via int(total_count))."""
        k1, k2 = jax.random.split(key)
        shape = tuple(sample_shape) + self.batch_shape
        alpha = jnp.broadcast_to(self.concentration,
                                 shape + self.event_shape)
        p = jax.random.dirichlet(k1, alpha)
        n_cat = int(self.event_shape[0])
        rem_n = jnp.broadcast_to(self.total_count, shape).astype(
            jnp.float32)
        rem_p = jnp.ones(shape)
        counts = []
        for j in range(n_cat - 1):
            pj = jnp.clip(p[..., j] / jnp.maximum(rem_p, 1e-37), 0.0, 1.0)
            cj = jax.random.binomial(jax.random.fold_in(k2, j), rem_n, pj)
            counts.append(cj)
            rem_n = rem_n - cj
            rem_p = rem_p - p[..., j]
        counts.append(rem_n)
        return jnp.stack(counts, -1).astype(jnp.int32)

    def log_prob(self, x):
        alpha = self.concentration
        n = self.total_count
        a0 = jnp.sum(alpha, -1)
        return (gammaln(n + 1.0) + gammaln(a0) - gammaln(n + a0)
                + jnp.sum(gammaln(x + alpha) - gammaln(x + 1.0)
                          - gammaln(alpha), -1))

    @property
    def mean(self):
        alpha = self.concentration
        return (self.total_count[..., None] if jnp.ndim(self.total_count)
                else self.total_count) * alpha / jnp.sum(alpha, -1,
                                                         keepdims=True)


class GaussianRandomWalk(Distribution):
    """x_t = x_{t-1} + N(0, scale), x_0 ~ N(0, scale); event (num_steps,)."""

    _params = ("scale",)
    support = constraints.real_vector

    def __init__(self, scale=1.0, num_steps=1):
        self.scale = jnp.asarray(scale)
        self.num_steps = int(num_steps)
        super().__init__(jnp.shape(self.scale), (self.num_steps,))

    def sample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        steps = jax.random.normal(key, shape, jnp.result_type(float))
        return self.scale[..., None] * jnp.cumsum(steps, -1) \
            if jnp.ndim(self.scale) else self.scale * jnp.cumsum(steps, -1)

    def log_prob(self, x):
        scale = self.scale[..., None] if jnp.ndim(self.scale) else self.scale
        diffs = jnp.diff(x, axis=-1, prepend=jnp.zeros_like(x[..., :1]))
        z = diffs / scale
        return jnp.sum(-0.5 * z * z - jnp.log(scale)
                       - 0.5 * math.log(2 * math.pi), -1)

    @property
    def mean(self):
        return jnp.zeros(self.batch_shape + self.event_shape)

    @property
    def variance(self):
        t = jnp.arange(1, self.num_steps + 1, dtype=jnp.result_type(float))
        s2 = (self.scale ** 2)[..., None] if jnp.ndim(self.scale) \
            else self.scale ** 2
        return s2 * t


class VonMises(Distribution):
    """Circular distribution on (-pi, pi]; density
    exp(kappa cos(x - loc)) / (2 pi I0(kappa))."""

    _params = ("loc", "concentration")
    support = constraints.interval(-math.pi, math.pi)
    reparametrized = False
    _REJECTION_ROUNDS = 32   # acceptance >= ~0.58 -> failure < 1e-11

    def __init__(self, loc, concentration):
        self.loc = jnp.asarray(loc)
        self.concentration = jnp.asarray(concentration)
        super().__init__(_bshape(self.loc, self.concentration))

    def sample(self, key, sample_shape=()):
        """Best & Fisher (1979) wrapped-Cauchy rejection, vectorized over a
        fixed number of proposal rounds (static shapes under jit)."""
        shape = self.shape(sample_shape)
        kappa = jnp.broadcast_to(self.concentration, shape)
        # rho = (tau - sqrt(2 tau)) / (2 kappa) cancels catastrophically in
        # f32 below kappa ~ 3e-4 (rho -> 0/NaN made the rejection loop
        # fall through to all-zeros — r2 review).  The acceptance test is
        # exact for ANY rho in (0,1), so the small-kappa series
        # rho = k/2 + k^3/8 keeps correctness while fixing stability.
        kk = jnp.maximum(kappa, 1e-6)
        tau = 1.0 + jnp.sqrt(1.0 + 4.0 * kk**2)
        rho_exact = (tau - jnp.sqrt(2.0 * tau)) / (2.0 * kk)
        rho = jnp.where(kk < 0.05, kk / 2.0 + kk**3 / 8.0, rho_exact)
        r = (1.0 + rho**2) / (2.0 * rho)

        def round_(carry, kr):
            x, done = carry
            k1, k2, k3 = jax.random.split(kr, 3)
            u1 = jax.random.uniform(k1, shape)
            u2 = jax.random.uniform(k2, shape)
            u3 = jax.random.uniform(k3, shape)
            z = jnp.cos(math.pi * u1)
            f = (1.0 + r * z) / (r + z)
            c = kappa * (r - f)
            accept = (c * (2.0 - c) - u2 > 0) | (
                jnp.log(c / jnp.maximum(u2, 1e-37)) + 1.0 - c >= 0)
            theta = jnp.sign(u3 - 0.5) * jnp.arccos(jnp.clip(f, -1.0, 1.0))
            x = jnp.where(done, x, jnp.where(accept, theta, x))
            return (x, done | accept), None

        keys = jax.random.split(key, self._REJECTION_ROUNDS + 1)
        (x, _), _ = jax.lax.scan(
            round_, (jnp.zeros(shape), jnp.zeros(shape, bool)), keys[:-1])
        # kappa ~ 0: the distribution IS uniform on the circle
        # (TV distance <= kappa/2 < 5e-7 at the threshold)
        x = jnp.where(kappa < 1e-6,
                      jax.random.uniform(keys[-1], shape,
                                         minval=-math.pi, maxval=math.pi),
                      x)
        out = x + jnp.broadcast_to(self.loc, shape)
        return jnp.remainder(out + math.pi, 2.0 * math.pi) - math.pi

    def log_prob(self, x):
        kappa = self.concentration
        # log I0(k) = log(i0e(k)) + k  (overflow-safe)
        return (kappa * jnp.cos(x - self.loc)
                - math.log(2 * math.pi) - jnp.log(i0e(kappa)) - kappa)

    @property
    def mean(self):
        return self.loc

    @property
    def variance(self):
        from jax.scipy.special import i1e
        return 1.0 - i1e(self.concentration) / i0e(self.concentration)


class ZeroInflatedDistribution(Distribution):
    """Mixture of a point mass at zero (probability ``gate``) and any count
    ``base_dist``: P(0) = gate + (1-gate) P_base(0);
    P(k>0) = (1-gate) P_base(k)."""

    _params = ("base_dist", "gate")
    reparametrized = False

    def __init__(self, base_dist, gate=None, gate_logits=None):
        if (gate is None) == (gate_logits is None):
            raise ValueError("pass exactly one of gate/gate_logits")
        self.base_dist = base_dist
        self.gate = (jnp.asarray(gate) if gate is not None
                     else jax.nn.sigmoid(jnp.asarray(gate_logits)))
        super().__init__(jax.lax.broadcast_shapes(
            jnp.shape(self.gate), base_dist.batch_shape))

    @property
    def support(self):
        return self.base_dist.support

    def sample(self, key, sample_shape=()):
        k1, k2 = jax.random.split(key)
        base = self.base_dist.sample(k1, sample_shape)
        mask = jax.random.bernoulli(
            k2, jnp.broadcast_to(self.gate, base.shape))
        return jnp.where(mask, jnp.zeros_like(base), base)

    def log_prob(self, x):
        base_lp = self.base_dist.log_prob(x)
        log_gate = jnp.log(self.gate)
        log1m = jnp.log1p(-self.gate)
        at_zero = jnp.logaddexp(log_gate, log1m + base_lp)
        return jnp.where(x == 0, at_zero, log1m + base_lp)

    @property
    def mean(self):
        return (1.0 - self.gate) * self.base_dist.mean

    @property
    def variance(self):
        m, v = self.base_dist.mean, self.base_dist.variance
        return (1.0 - self.gate) * (v + self.gate * m * m)


def ZeroInflatedPoisson(gate, rate):
    from .discrete import Poisson
    return ZeroInflatedDistribution(Poisson(rate), gate=gate)


def ZeroInflatedNegativeBinomial(gate, total_count, probs=None, logits=None):
    from .discrete import NegativeBinomial
    return ZeroInflatedDistribution(
        NegativeBinomial(total_count, probs=probs, logits=logits), gate=gate)


class Censored(Distribution):
    """Censoring wrapper: observations recorded AT a bound carry that
    tail's probability mass (Type-I censoring, e.g. survival analysis,
    detection limits).

    ``log_prob``: interior x -> base density; x <= lower -> log F(lower);
    x >= upper -> log (1 - F(upper)).  Requires ``base_dist.cdf``.
    ``sample`` draws from the base and clips to the bounds (the observable
    quantity)."""

    _params = ("base_dist", "lower", "upper")
    reparametrized = False

    def __init__(self, base_dist, lower=None, upper=None):
        if lower is None and upper is None:
            raise ValueError("Censored needs at least one bound")
        if not hasattr(base_dist, "cdf"):
            raise ValueError(
                f"{type(base_dist).__name__} has no cdf; censoring needs it")
        self.base_dist = base_dist
        self.lower = None if lower is None else jnp.asarray(lower)
        self.upper = None if upper is None else jnp.asarray(upper)
        shapes = [base_dist.batch_shape]
        for b in (self.lower, self.upper):
            if b is not None:
                shapes.append(jnp.shape(b))
        super().__init__(jax.lax.broadcast_shapes(*shapes),
                         base_dist.event_shape)

    @property
    def support(self):
        return self.base_dist.support

    def sample(self, key, sample_shape=()):
        x = self.base_dist.sample(key, sample_shape)
        if self.lower is not None:
            x = jnp.maximum(x, self.lower)
        if self.upper is not None:
            x = jnp.minimum(x, self.upper)
        return x

    def log_prob(self, x):
        # evaluate the base density at a value pushed safely inside the
        # bounds so the where() never sees NaN/inf gradients at the bound
        safe = x
        if self.lower is not None:
            safe = jnp.maximum(safe, self.lower + 1e-6)
        if self.upper is not None:
            safe = jnp.minimum(safe, self.upper - 1e-6)
        lp = self.base_dist.log_prob(safe)
        if self.lower is not None:
            mass = jnp.clip(self.base_dist.cdf(self.lower), 1e-37, 1.0)
            lp = jnp.where(x <= self.lower, jnp.log(mass), lp)
        if self.upper is not None:
            sf = jnp.clip(1.0 - self.base_dist.cdf(self.upper), 1e-37, 1.0)
            lp = jnp.where(x >= self.upper, jnp.log(sf), lp)
        return lp


class Truncated(Distribution):
    """Generic truncation of any scalar continuous ``base_dist`` with a
    ``cdf``: density renormalized to [lower, upper], sampling by inverse-
    cdf of a uniform on [F(lower), F(upper)] (needs ``base_dist.icdf``;
    falls back to a fixed-round rejection loop otherwise).

    For a truncated Normal prefer ``dist.TruncatedNormal`` (specialized
    sampler)."""

    _params = ("base_dist", "lower", "upper")

    def __init__(self, base_dist, lower=-jnp.inf, upper=jnp.inf):
        if not hasattr(base_dist, "cdf"):
            raise ValueError(
                f"{type(base_dist).__name__} has no cdf; truncation "
                "needs it")
        self.base_dist = base_dist
        self.lower = jnp.asarray(lower)
        self.upper = jnp.asarray(upper)
        super().__init__(jax.lax.broadcast_shapes(
            base_dist.batch_shape, jnp.shape(self.lower),
            jnp.shape(self.upper)), base_dist.event_shape)

    @property
    def support(self):
        return constraints.interval(self.lower, self.upper)

    def _bounds_cdf(self):
        flo = jnp.where(jnp.isfinite(self.lower),
                        self.base_dist.cdf(jnp.where(
                            jnp.isfinite(self.lower), self.lower, 0.0)),
                        0.0)
        fhi = jnp.where(jnp.isfinite(self.upper),
                        self.base_dist.cdf(jnp.where(
                            jnp.isfinite(self.upper), self.upper, 0.0)),
                        1.0)
        return flo, fhi

    def sample(self, key, sample_shape=()):
        flo, fhi = self._bounds_cdf()
        shape = self.shape(sample_shape)
        u = jax.random.uniform(key, shape, jnp.result_type(float),
                               1e-7, 1.0 - 1e-7)
        q = flo + u * (fhi - flo)
        if hasattr(self.base_dist, "icdf"):
            x = self.base_dist.icdf(q)
        else:
            # 60 bisection rounds on the cdf (static under jit)
            lo = jnp.broadcast_to(jnp.where(jnp.isfinite(self.lower),
                                            self.lower, -1e10), shape)
            hi = jnp.broadcast_to(jnp.where(jnp.isfinite(self.upper),
                                            self.upper, 1e10), shape)

            def body(carry, _):
                lo, hi = carry
                mid = 0.5 * (lo + hi)
                below = self.base_dist.cdf(mid) < q
                return (jnp.where(below, mid, lo),
                        jnp.where(below, hi, mid)), None

            (lo, hi), _ = jax.lax.scan(body, (lo, hi), None, length=60)
            x = 0.5 * (lo + hi)
        return jnp.clip(x, self.lower, self.upper)

    def log_prob(self, x):
        flo, fhi = self._bounds_cdf()
        log_norm = jnp.log(jnp.clip(fhi - flo, 1e-37, 1.0))
        inside = (x >= self.lower) & (x <= self.upper)
        return jnp.where(inside,
                         self.base_dist.log_prob(x) - log_norm, -jnp.inf)
