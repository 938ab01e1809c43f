"""Discrete distribution families.

Blueprint: SURVEY.md C1 — Bernoulli, Binomial, Categorical, Poisson (observed
likelihood sites: hierarchical logistic regression, GMM assignments are
marginalised).  Discrete sites have no bijector, so they are observation-only
(or explicitly enumerated) — enforced by ``constraints.is_discrete``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln, logsumexp, xlog1py, xlogy

from . import constraints
from .distribution import Distribution

__all__ = ["Bernoulli", "Binomial", "Categorical", "Poisson"]


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
        return xlogy(x, self.rate) - self.rate - gammaln(x + 1.0)

    @property
    def mean(self):
        return self.rate

    @property
    def variance(self):
        return self.rate
