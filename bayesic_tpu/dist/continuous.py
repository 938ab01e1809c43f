"""Scalar continuous distribution families.

Blueprint: SURVEY.md C1 — Normal, HalfNormal, LogNormal, Cauchy, HalfCauchy,
StudentT, Laplace, Exponential, Gamma, InverseGamma, Beta, Uniform, with
reparameterized sampling wherever JAX supports pathwise gradients (Normal
family trivially; Gamma/Beta/Dirichlet via jax's implicit-gradient samplers),
as required by BASELINE.json north_star "reparameterized ELBO estimators".
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import betaln, gammaln, ndtr, ndtri

from . import constraints
from .distribution import Distribution

__all__ = [
    "Normal",
    "LogNormal",
    "HalfNormal",
    "Cauchy",
    "HalfCauchy",
    "StudentT",
    "Laplace",
    "Exponential",
    "Gamma",
    "InverseGamma",
    "Beta",
    "Uniform",
    "TruncatedNormal",
    "Weibull",
    "Gumbel",
    "Pareto",
    "Chi2",
]

_LOG_2PI = math.log(2.0 * math.pi)


def _bshape(*args):
    return jax.lax.broadcast_shapes(*(jnp.shape(a) for a in args))


class Normal(Distribution):
    _params = ("loc", "scale")

    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = loc, scale
        super().__init__(_bshape(loc, scale))

    def sample(self, key, sample_shape=()):
        eps = jax.random.normal(key, self.shape(sample_shape),
                                jnp.result_type(float))
        return self.loc + self.scale * eps

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return -0.5 * z * z - jnp.log(self.scale) - 0.5 * _LOG_2PI

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(
            jnp.square(self.scale), self.batch_shape
        )

    def entropy(self):
        return jnp.broadcast_to(
            0.5 * (1.0 + _LOG_2PI) + jnp.log(self.scale), self.batch_shape
        )

    def cdf(self, x):
        return ndtr((x - self.loc) / self.scale)

    def icdf(self, q):
        return self.loc + self.scale * ndtri(q)


class LogNormal(Distribution):
    _params = ("loc", "scale")
    support = constraints.positive

    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = loc, scale
        super().__init__(_bshape(loc, scale))

    def sample(self, key, sample_shape=()):
        eps = jax.random.normal(key, self.shape(sample_shape),
                                jnp.result_type(float))
        return jnp.exp(self.loc + self.scale * eps)

    def log_prob(self, x):
        logx = jnp.log(x)
        z = (logx - self.loc) / self.scale
        return -0.5 * z * z - jnp.log(self.scale) - 0.5 * _LOG_2PI - logx

    @property
    def mean(self):
        return jnp.exp(self.loc + 0.5 * jnp.square(self.scale))

    @property
    def variance(self):
        s2 = jnp.square(self.scale)
        return (jnp.exp(s2) - 1.0) * jnp.exp(2.0 * self.loc + s2)

    def cdf(self, x):
        return ndtr((jnp.log(x) - self.loc) / self.scale)

    def icdf(self, q):
        return jnp.exp(self.loc + self.scale * ndtri(q))


class HalfNormal(Distribution):
    _params = ("scale",)
    support = constraints.positive

    def __init__(self, scale=1.0):
        self.scale = scale
        super().__init__(_bshape(scale))

    def sample(self, key, sample_shape=()):
        eps = jax.random.normal(key, self.shape(sample_shape),
                                jnp.result_type(float))
        return jnp.abs(self.scale * eps)

    def log_prob(self, x):
        z = x / self.scale
        return (
            math.log(2.0) - 0.5 * z * z - jnp.log(self.scale) - 0.5 * _LOG_2PI
        )

    @property
    def mean(self):
        return self.scale * math.sqrt(2.0 / math.pi)

    @property
    def variance(self):
        return jnp.square(self.scale) * (1.0 - 2.0 / math.pi)

    def cdf(self, x):
        return 2.0 * ndtr(x / self.scale) - 1.0


class Cauchy(Distribution):
    _params = ("loc", "scale")

    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = loc, scale
        super().__init__(_bshape(loc, scale))

    def sample(self, key, sample_shape=()):
        u = jax.random.uniform(key, self.shape(sample_shape),
                               jnp.result_type(float))
        return self.loc + self.scale * jnp.tan(math.pi * (u - 0.5))

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return -math.log(math.pi) - jnp.log(self.scale) - jnp.log1p(z * z)

    def cdf(self, x):
        return 0.5 + jnp.arctan((x - self.loc) / self.scale) / jnp.pi

    def icdf(self, q):
        return self.loc + self.scale * jnp.tan(jnp.pi * (q - 0.5))


class HalfCauchy(Distribution):
    _params = ("scale",)
    support = constraints.positive

    def __init__(self, scale=1.0):
        self.scale = scale
        super().__init__(_bshape(scale))

    def sample(self, key, sample_shape=()):
        u = jax.random.uniform(key, self.shape(sample_shape),
                               jnp.result_type(float))
        return self.scale * jnp.abs(jnp.tan(math.pi * (u - 0.5)))

    def log_prob(self, x):
        z = x / self.scale
        return (
            math.log(2.0 / math.pi) - jnp.log(self.scale) - jnp.log1p(z * z)
        )

    def cdf(self, x):
        return 2.0 * jnp.arctan(x / self.scale) / jnp.pi


class StudentT(Distribution):
    _params = ("df", "loc", "scale")

    def __init__(self, df, loc=0.0, scale=1.0):
        self.df, self.loc, self.scale = df, loc, scale
        super().__init__(_bshape(df, loc, scale))

    def sample(self, key, sample_shape=()):
        # loc/scale are pathwise-reparameterized; df is not.
        t = jax.random.t(key, self.df, self.shape(sample_shape),
                         jnp.result_type(float))
        return self.loc + self.scale * t

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        half = 0.5 * (self.df + 1.0)
        return (
            gammaln(half)
            - gammaln(0.5 * self.df)
            - 0.5 * jnp.log(self.df * math.pi)
            - jnp.log(self.scale)
            - half * jnp.log1p(z * z / self.df)
        )

    @property
    def mean(self):
        return jnp.where(self.df > 1, self.loc, jnp.nan)

    @property
    def variance(self):
        v = jnp.square(self.scale) * self.df / (self.df - 2.0)
        return jnp.where(self.df > 2, v, jnp.nan)

    def cdf(self, x):
        from jax.scipy.special import betainc
        z = (x - self.loc) / self.scale
        ib = betainc(0.5 * self.df, 0.5,
                     self.df / (self.df + z * z))
        return jnp.where(z >= 0, 1.0 - 0.5 * ib, 0.5 * ib)


class Laplace(Distribution):
    _params = ("loc", "scale")

    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = loc, scale
        super().__init__(_bshape(loc, scale))

    def sample(self, key, sample_shape=()):
        eps = jax.random.laplace(key, self.shape(sample_shape),
                                 jnp.result_type(float))
        return self.loc + self.scale * eps

    def log_prob(self, x):
        z = jnp.abs(x - self.loc) / self.scale
        return -z - jnp.log(2.0 * self.scale)

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def variance(self):
        return 2.0 * jnp.square(self.scale)

    def cdf(self, x):
        z = (x - self.loc) / self.scale
        return jnp.where(z < 0, 0.5 * jnp.exp(z), 1.0 - 0.5 * jnp.exp(-z))


class Exponential(Distribution):
    _params = ("rate",)
    support = constraints.positive

    def __init__(self, rate=1.0):
        self.rate = rate
        super().__init__(_bshape(rate))

    def sample(self, key, sample_shape=()):
        eps = jax.random.exponential(key, self.shape(sample_shape),
                                     jnp.result_type(float))
        return eps / self.rate

    def log_prob(self, x):
        return jnp.log(self.rate) - self.rate * x

    @property
    def mean(self):
        return 1.0 / self.rate

    @property
    def variance(self):
        return 1.0 / jnp.square(self.rate)

    def entropy(self):
        return 1.0 - jnp.log(self.rate)

    def cdf(self, x):
        return -jnp.expm1(-self.rate * x)

    def icdf(self, q):
        return -jnp.log1p(-q) / self.rate


class Gamma(Distribution):
    """Shape/rate parameterization. Sampling is pathwise-differentiable in
    ``concentration`` via jax.random.gamma's implicit gradients."""

    _params = ("concentration", "rate")
    support = constraints.positive

    def __init__(self, concentration, rate=1.0):
        self.concentration, self.rate = concentration, rate
        super().__init__(_bshape(concentration, rate))

    def sample(self, key, sample_shape=()):
        conc = jnp.broadcast_to(self.concentration, self.shape(sample_shape))
        g = jax.random.gamma(key, conc, dtype=jnp.result_type(float))
        return g / self.rate

    def log_prob(self, x):
        a, b = self.concentration, self.rate
        return a * jnp.log(b) + (a - 1.0) * jnp.log(x) - b * x - gammaln(a)

    @property
    def mean(self):
        return self.concentration / self.rate

    @property
    def variance(self):
        return self.concentration / jnp.square(self.rate)

    def cdf(self, x):
        from jax.scipy.special import gammainc
        return gammainc(self.concentration, self.rate * x)


class InverseGamma(Distribution):
    _params = ("concentration", "scale")
    support = constraints.positive

    def __init__(self, concentration, scale=1.0):
        self.concentration, self.scale = concentration, scale
        super().__init__(_bshape(concentration, scale))

    def sample(self, key, sample_shape=()):
        conc = jnp.broadcast_to(self.concentration, self.shape(sample_shape))
        g = jax.random.gamma(key, conc, dtype=jnp.result_type(float))
        return self.scale / g

    def log_prob(self, x):
        a, b = self.concentration, self.scale
        return a * jnp.log(b) - (a + 1.0) * jnp.log(x) - b / x - gammaln(a)

    @property
    def mean(self):
        return jnp.where(
            self.concentration > 1, self.scale / (self.concentration - 1.0),
            jnp.nan,
        )


class Beta(Distribution):
    _params = ("concentration1", "concentration0")
    support = constraints.unit_interval

    def __init__(self, concentration1, concentration0):
        self.concentration1 = concentration1
        self.concentration0 = concentration0
        super().__init__(_bshape(concentration1, concentration0))

    def sample(self, key, sample_shape=()):
        a = jnp.broadcast_to(self.concentration1, self.shape(sample_shape))
        b = jnp.broadcast_to(self.concentration0, self.shape(sample_shape))
        return jax.random.beta(key, a, b, dtype=jnp.result_type(float))

    def log_prob(self, x):
        a, b = self.concentration1, self.concentration0
        return (
            (a - 1.0) * jnp.log(x)
            + (b - 1.0) * jnp.log1p(-x)
            - betaln(a, b)
        )

    @property
    def mean(self):
        a, b = self.concentration1, self.concentration0
        return a / (a + b)

    @property
    def variance(self):
        a, b = self.concentration1, self.concentration0
        t = a + b
        return a * b / (t * t * (t + 1.0))

    def cdf(self, x):
        from jax.scipy.special import betainc
        return betainc(self.concentration1, self.concentration0, x)


class Uniform(Distribution):
    _params = ("low", "high")

    def __init__(self, low=0.0, high=1.0):
        self.low, self.high = low, high
        super().__init__(_bshape(low, high))

    @property
    def support(self):
        return constraints.interval(self.low, self.high)

    def sample(self, key, sample_shape=()):
        u = jax.random.uniform(key, self.shape(sample_shape),
                               jnp.result_type(float))
        return self.low + (self.high - self.low) * u

    def log_prob(self, x):
        lp = -jnp.log(self.high - self.low)
        return jnp.where((x >= self.low) & (x <= self.high), lp, -jnp.inf)

    @property
    def mean(self):
        return 0.5 * (self.low + self.high)

    @property
    def variance(self):
        return jnp.square(self.high - self.low) / 12.0

    def cdf(self, x):
        return jnp.clip((x - self.low) / (self.high - self.low), 0.0, 1.0)

    def icdf(self, q):
        return self.low + q * (self.high - self.low)


class TruncatedNormal(Distribution):
    """Normal(loc, scale) truncated to [low, high] (either may be +-inf)."""

    _params = ("loc", "scale", "low", "high")

    def __init__(self, loc=0.0, scale=1.0, low=-jnp.inf, high=jnp.inf):
        self.loc, self.scale = loc, scale
        self.low, self.high = low, high
        super().__init__(_bshape(loc, scale, low, high))

    @property
    def support(self):
        return constraints.interval(self.low, self.high)

    def _alpha_beta(self):
        a = (self.low - self.loc) / self.scale
        b = (self.high - self.loc) / self.scale
        return a, b

    def sample(self, key, sample_shape=()):
        a, b = self._alpha_beta()
        shape = self.shape(sample_shape)
        z = jax.random.truncated_normal(
            key, jnp.broadcast_to(a, shape), jnp.broadcast_to(b, shape),
            shape, jnp.result_type(float),
        )
        return self.loc + self.scale * z

    def log_prob(self, x):
        a, b = self._alpha_beta()
        z = (x - self.loc) / self.scale
        # stable normalizer: the mass ndtr(b) - ndtr(a) is computed on
        # whichever side conditions better — the cdf form cancels in f32
        # for far-upper windows (log_ndtr ~ -1e-19 rounds through
        # exp() to 1), where the survival form sf(a) - sf(b) has
        # well-scaled logs; and points outside [low, high] get exactly
        # -inf (r2 review: they used to carry the untruncated density)
        from jax.scipy.special import log_ndtr

        def _log_diff(log_big, log_small):
            return log_big + jnp.log1p(
                -jnp.exp(jnp.minimum(log_small - log_big, 0.0)))

        log_mass_cdf = _log_diff(log_ndtr(b), log_ndtr(a))
        log_mass_sf = _log_diff(log_ndtr(-a), log_ndtr(-b))
        log_norm = jnp.where(a > 0, log_mass_sf, log_mass_cdf)
        lp = -0.5 * z * z - 0.5 * _LOG_2PI - jnp.log(self.scale) - log_norm
        inside = (x >= self.low) & (x <= self.high)
        return jnp.where(inside, lp, -jnp.inf)


class Weibull(Distribution):
    _params = ("scale", "concentration")
    support = constraints.positive

    def __init__(self, scale, concentration):
        self.scale, self.concentration = scale, concentration
        super().__init__(_bshape(scale, concentration))

    def sample(self, key, sample_shape=()):
        u = jax.random.uniform(key, self.shape(sample_shape),
                               jnp.result_type(float), 1e-7, 1.0)
        return self.scale * (-jnp.log(u)) ** (1.0 / self.concentration)

    def log_prob(self, x):
        k, lam = self.concentration, self.scale
        z = x / lam
        return jnp.log(k / lam) + (k - 1.0) * jnp.log(z) - z**k

    @property
    def mean(self):
        from jax.scipy.special import gammaln
        return self.scale * jnp.exp(gammaln(1.0 + 1.0 / self.concentration))

    def cdf(self, x):
        return -jnp.expm1(-((x / self.scale) ** self.concentration))

    def icdf(self, q):
        return self.scale * (-jnp.log1p(-q)) ** (1.0 / self.concentration)


class Gumbel(Distribution):
    _params = ("loc", "scale")

    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = loc, scale
        super().__init__(_bshape(loc, scale))

    def sample(self, key, sample_shape=()):
        g = jax.random.gumbel(key, self.shape(sample_shape),
                              jnp.result_type(float))
        return self.loc + self.scale * g

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return -(z + jnp.exp(-z)) - jnp.log(self.scale)

    @property
    def mean(self):
        return self.loc + self.scale * 0.5772156649015329

    @property
    def variance(self):
        return (math.pi**2 / 6.0) * jnp.square(self.scale)

    def cdf(self, x):
        return jnp.exp(-jnp.exp(-(x - self.loc) / self.scale))

    def icdf(self, q):
        return self.loc - self.scale * jnp.log(-jnp.log(q))


class Pareto(Distribution):
    """P(X > x) = (scale/x)^alpha for x >= scale."""

    _params = ("scale", "alpha")

    def __init__(self, scale, alpha):
        self.scale, self.alpha = scale, alpha
        super().__init__(_bshape(scale, alpha))

    @property
    def support(self):
        return constraints.greater_than(self.scale)

    def sample(self, key, sample_shape=()):
        e = jax.random.exponential(key, self.shape(sample_shape),
                                   jnp.result_type(float))
        return self.scale * jnp.exp(e / self.alpha)

    def log_prob(self, x):
        return (
            jnp.log(self.alpha) + self.alpha * jnp.log(self.scale)
            - (self.alpha + 1.0) * jnp.log(x)
        )

    @property
    def mean(self):
        return jnp.where(
            self.alpha > 1, self.alpha * self.scale / (self.alpha - 1.0),
            jnp.inf,
        )

    def cdf(self, x):
        return 1.0 - (self.scale / x) ** self.alpha


class Chi2(Gamma):
    def __init__(self, df):
        # df is derived (df = 2*concentration) rather than stored, so the
        # pytree leaves stay exactly Gamma's
        super().__init__(0.5 * jnp.asarray(df), 0.5)

    @property
    def df(self):
        return 2.0 * self.concentration
