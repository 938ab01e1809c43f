"""Discrete distribution families.

Blueprint: SURVEY.md C1 — Bernoulli, Binomial, Categorical, Poisson (observed
likelihood sites: hierarchical logistic regression, GMM assignments are
marginalised).  Discrete sites have no bijector, so they are observation-only
(or explicitly enumerated) — enforced by ``constraints.is_discrete``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln, logsumexp, xlogy

from . import constraints
from .distribution import Distribution

__all__ = ["Bernoulli", "Binomial", "Categorical", "OrderedLogistic",
           "Poisson", "Geometric", "NegativeBinomial", "Multinomial"]


def _bshape(*args):
    return jax.lax.broadcast_shapes(*(jnp.shape(a) for a in args))


def _logits_from_probs(probs):
    return jnp.log(probs) - jnp.log1p(-probs)


class Bernoulli(Distribution):
    _params = ("logits",)
    support = constraints.boolean
    reparametrized = False

    def __init__(self, probs=None, logits=None):
        if (probs is None) == (logits is None):
            raise ValueError("pass exactly one of probs/logits")
        self.logits = (
            jnp.asarray(logits) if logits is not None
            else _logits_from_probs(jnp.asarray(probs))
        )
        super().__init__(_bshape(self.logits))

    @property
    def probs(self):
        return jax.nn.sigmoid(self.logits)

    def sample(self, key, sample_shape=()):
        return jax.random.bernoulli(
            key, self.probs, self.shape(sample_shape)
        ).astype(jnp.int32)

    def log_prob(self, x):
        # x*l - softplus(l), valid for x in {0,1}
        return x * self.logits - jax.nn.softplus(self.logits)

    @property
    def mean(self):
        return self.probs

    @property
    def variance(self):
        p = self.probs
        return p * (1.0 - p)


class Binomial(Distribution):
    _params = ("total_count", "logits")
    reparametrized = False

    def __init__(self, total_count, probs=None, logits=None):
        if (probs is None) == (logits is None):
            raise ValueError("pass exactly one of probs/logits")
        self.total_count = jnp.asarray(total_count)
        self.logits = (
            jnp.asarray(logits) if logits is not None
            else _logits_from_probs(jnp.asarray(probs))
        )
        super().__init__(_bshape(self.total_count, self.logits))

    @property
    def support(self):
        return constraints.integer_interval(0, self.total_count)

    @property
    def probs(self):
        return jax.nn.sigmoid(self.logits)

    def sample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        n = jnp.broadcast_to(self.total_count, shape)
        p = jnp.broadcast_to(self.probs, shape)
        return jax.random.binomial(key, n, p).astype(jnp.int32)

    def log_prob(self, x):
        n = self.total_count
        log_comb = gammaln(n + 1.0) - gammaln(x + 1.0) - gammaln(n - x + 1.0)
        # x*log p + (n-x)*log(1-p) in logits form
        return log_comb + x * self.logits - n * jax.nn.softplus(self.logits)

    @property
    def mean(self):
        return self.total_count * self.probs

    @property
    def variance(self):
        p = self.probs
        return self.total_count * p * (1.0 - p)


class Categorical(Distribution):
    _params = ("logits",)
    _param_event_ndims = {"logits": 1}
    reparametrized = False

    def __init__(self, probs=None, logits=None):
        if (probs is None) == (logits is None):
            raise ValueError("pass exactly one of probs/logits")
        self.logits = (
            jnp.asarray(logits) if logits is not None
            else jnp.log(jnp.asarray(probs))
        )
        super().__init__(_bshape(self.logits)[:-1])

    @property
    def support(self):
        return constraints.integer_interval(0, self.logits.shape[-1] - 1)

    @property
    def num_categories(self):
        return self.logits.shape[-1]

    @property
    def probs(self):
        return jax.nn.softmax(self.logits, axis=-1)

    def log_probs_normalized(self):
        return self.logits - logsumexp(self.logits, axis=-1, keepdims=True)

    def sample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        return jax.random.categorical(
            key, self.logits, axis=-1, shape=shape
        ).astype(jnp.int32)

    def log_prob(self, x):
        logp = self.log_probs_normalized()
        x = jnp.asarray(x)
        xb = jnp.broadcast_to(
            x, jax.lax.broadcast_shapes(x.shape, self.batch_shape)
        )
        logp = jnp.broadcast_to(logp, xb.shape + (self.num_categories,))
        return jnp.take_along_axis(
            logp, xb[..., None].astype(jnp.int32), axis=-1
        )[..., 0]

    @property
    def mean(self):
        k = jnp.arange(self.num_categories, dtype=jnp.result_type(float))
        return jnp.sum(self.probs * k, axis=-1)


class OrderedLogistic(Categorical):
    """Ordinal regression likelihood: a latent logistic variable at
    location ``predictor`` cut into ``K`` ordered categories by ``K-1``
    ascending ``cutpoints`` (SURVEY.md C1; pair latent cutpoints with
    ``constraints.ordered`` so NUTS/SVI sample them unconstrained).

    ``P(Y = k) = sigmoid(c_k - eta) - sigmoid(c_{k-1} - eta)`` with
    ``c_{-1} = -inf``, ``c_{K-1} = +inf``; implemented as a Categorical
    over those probabilities, so enumeration/Gibbs machinery applies
    unchanged.

    Cutpoints MUST be ascending (the distribution is undefined otherwise).
    Category log-probs are computed directly in log space via the identity
    ``sigmoid(a) - sigmoid(b) = sigmoid(a) * sigmoid(-b) * (1 - e^{b-a})``
    — stable for extreme predictors where the sigmoid difference would
    cancel in f32 — and a NON-ascending pair produces NaN (``log`` of a
    negative difference), surfacing the invalid parameterization instead
    of the silently-wrong clipped density an earlier version returned."""

    def __init__(self, predictor, cutpoints):
        pred = jnp.asarray(predictor)[..., None]
        cp = jnp.asarray(cutpoints)
        d = cp - pred                                         # (..., K-1)
        pad = jnp.full(d.shape[:-1] + (1,), jnp.inf, d.dtype)
        upper = jnp.concatenate([d, pad], -1)                 # c_k - eta
        lower = jnp.concatenate([-pad, d], -1)                # c_{k-1} - eta
        # log(sigmoid(u) - sigmoid(l)) for u > l; the inf pads make the
        # edge categories exact (log_sigmoid(inf) = 0, expm1(-inf) = -1)
        logits = (jax.nn.log_sigmoid(upper) + jax.nn.log_sigmoid(-lower)
                  + jnp.log(-jnp.expm1(lower - upper)))
        super().__init__(logits=logits)


class Poisson(Distribution):
    _params = ("rate",)
    support = constraints.nonnegative_integer
    reparametrized = False

    def __init__(self, rate):
        self.rate = rate
        super().__init__(_bshape(rate))

    def sample(self, key, sample_shape=()):
        return jax.random.poisson(
            key, self.rate, self.shape(sample_shape)
        ).astype(jnp.int32)

    def log_prob(self, x):
        # cast counts to float: xlogy's jvp emits float0 tangents for int x
        xf = jnp.asarray(x, jnp.result_type(float))
        return xlogy(xf, self.rate) - self.rate - gammaln(xf + 1.0)

    @property
    def mean(self):
        return self.rate

    @property
    def variance(self):
        return self.rate


class Geometric(Distribution):
    """Number of failures before the first success; support {0, 1, ...}."""

    _params = ("logits",)
    support = constraints.nonnegative_integer
    reparametrized = False

    def __init__(self, probs=None, logits=None):
        if (probs is None) == (logits is None):
            raise ValueError("pass exactly one of probs/logits")
        self.logits = (
            jnp.asarray(logits) if logits is not None
            else _logits_from_probs(jnp.asarray(probs))
        )
        super().__init__(_bshape(self.logits))

    @property
    def probs(self):
        return jax.nn.sigmoid(self.logits)

    def sample(self, key, sample_shape=()):
        u = jax.random.uniform(key, self.shape(sample_shape),
                               jnp.result_type(float), 1e-7, 1.0)
        # floor(log U / log(1-p)); log(1-p) = -softplus(logits)
        return jnp.floor(
            jnp.log(u) / (-jax.nn.softplus(self.logits))
        ).astype(jnp.int32)

    def log_prob(self, x):
        # k*log(1-p) + log p
        return -x * jax.nn.softplus(self.logits) \
            - jax.nn.softplus(-self.logits)

    @property
    def mean(self):
        p = self.probs
        return (1.0 - p) / p

    @property
    def variance(self):
        p = self.probs
        return (1.0 - p) / (p * p)


class NegativeBinomial(Distribution):
    """Failures-before-r-th-success parameterization:
    P(K=k) = C(k+r-1, k) (1-p)^r p^k with p = sigmoid(logits)."""

    _params = ("total_count", "logits")
    support = constraints.nonnegative_integer
    reparametrized = False

    def __init__(self, total_count, probs=None, logits=None):
        if (probs is None) == (logits is None):
            raise ValueError("pass exactly one of probs/logits")
        self.total_count = jnp.asarray(total_count)
        self.logits = (
            jnp.asarray(logits) if logits is not None
            else _logits_from_probs(jnp.asarray(probs))
        )
        super().__init__(_bshape(self.total_count, self.logits))

    @property
    def probs(self):
        return jax.nn.sigmoid(self.logits)

    def sample(self, key, sample_shape=()):
        # Gamma-Poisson mixture: lam ~ Gamma(r, (1-p)/p); K ~ Poisson(lam)
        k1, k2 = jax.random.split(key)
        shape = self.shape(sample_shape)
        r = jnp.broadcast_to(self.total_count, shape)
        g = jax.random.gamma(k1, r, dtype=jnp.result_type(float))
        rate = jnp.exp(-self.logits)          # (1-p)/p
        lam = g / jnp.broadcast_to(rate, shape)
        return jax.random.poisson(k2, lam).astype(jnp.int32)

    def log_prob(self, x):
        r = self.total_count
        log_comb = gammaln(x + r) - gammaln(r) - gammaln(x + 1.0)
        # k log p + r log(1-p)
        return log_comb + x * (-jax.nn.softplus(-self.logits)) \
            + r * (-jax.nn.softplus(self.logits))

    @property
    def mean(self):
        return self.total_count * jnp.exp(self.logits)

    @property
    def variance(self):
        return self.mean / jax.nn.sigmoid(-self.logits)


class Multinomial(Distribution):
    """Counts over K categories from ``total_count`` trials; event dim 1."""

    _params = ("logits",)
    _param_event_ndims = {"logits": 1}
    reparametrized = False

    def __init__(self, total_count, probs=None, logits=None):
        if (probs is None) == (logits is None):
            raise ValueError("pass exactly one of probs/logits")
        self.total_count = int(total_count)
        self.logits = (
            jnp.asarray(logits) if logits is not None
            else jnp.log(jnp.asarray(probs))
        )
        super().__init__(_bshape(self.logits)[:-1],
                         (self.logits.shape[-1],))

    @property
    def support(self):
        return constraints.nonnegative_integer  # per-coordinate; sums to n

    @property
    def probs(self):
        return jax.nn.softmax(self.logits, axis=-1)

    def sample(self, key, sample_shape=()):
        # chain of binomial splits over the K categories (K static)
        k = self.logits.shape[-1]
        shape = tuple(sample_shape) + self.batch_shape
        p = jnp.broadcast_to(self.probs, shape + (k,))
        remaining = jnp.full(shape, self.total_count, jnp.float32)
        rem_p = jnp.ones(shape, jnp.result_type(float))
        counts = []
        for i in range(k - 1):
            cond_p = jnp.clip(p[..., i] / jnp.clip(rem_p, 1e-12), 0.0, 1.0)
            c = jax.random.binomial(jax.random.fold_in(key, i), remaining,
                                    cond_p)
            counts.append(c)
            remaining = remaining - c
            rem_p = rem_p - p[..., i]
        counts.append(remaining)
        return jnp.stack(counts, -1).astype(jnp.int32)

    def log_prob(self, x):
        logp = self.logits - logsumexp(self.logits, -1, keepdims=True)
        return (
            gammaln(jnp.asarray(self.total_count, jnp.result_type(float))
                    + 1.0)
            - jnp.sum(gammaln(x + 1.0), -1)
            + jnp.sum(x * logp, -1)
        )

    @property
    def mean(self):
        return self.total_count * self.probs
