"""Variational guides over a model's unconstrained latent space.

Blueprint: SURVEY.md C6 — mean-field Gaussian, full-rank Gaussian (Cholesky),
and amortized/neural guides (BASELINE.json north_star "mean-field and
full-rank Gaussian guides"; configs[4] "VAE-style amortized guide").

Guides are deliberately *unconstrained-space* objects: the log-joint compiler
(SURVEY.md C4) already moved every latent site to R^n, so q is a density on
R^dim and the ELBO needs no per-site Jacobian bookkeeping.  ``sample_and_
log_prob`` uses the reparameterization trick throughout (pathwise gradients).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...dist.transforms import LowerCholeskyTransform

__all__ = ["unraveler", "Guide", "MeanFieldGuide", "FullRankGuide",
           "NeuralGuide"]

_LOG_2PI = math.log(2.0 * math.pi)


def unraveler(info):
    """(dim, unravel, ravel) for ``info.unconstrained_shapes``; ``unravel``
    supports arbitrary leading batch dims on the flat vector."""
    names = list(info.latent_names)
    shapes = [info.unconstrained_shapes[n] for n in names]
    sizes = [int(math.prod(s)) if s else 1 for s in shapes]
    offsets = [0]
    for s in sizes:
        offsets.append(offsets[-1] + s)
    dim = offsets[-1]

    def unravel(flat):
        batch = flat.shape[:-1]
        return {
            n: flat[..., o:o + s].reshape(batch + tuple(shape))
            for n, o, s, shape in zip(names, offsets, sizes, shapes)
        }

    def ravel(uparams):
        some = uparams[names[0]]
        batch = some.shape[:len(some.shape) - len(shapes[0])]
        return jnp.concatenate(
            [uparams[n].reshape(batch + (s,)) for n, s in zip(names, sizes)],
            axis=-1,
        )

    return dim, unravel, ravel


class Guide:
    """Interface: ``init(key) -> params``; ``sample_and_log_prob(params, key,
    sample_shape) -> (uparams dict with leading sample dims, logq)``."""

    def init(self, key):
        raise NotImplementedError

    def sample_and_log_prob(self, params, key, sample_shape=(),
                            stop_gradient_q=False, ctx=None):
        """``ctx`` (optional dict with keys ``subsample``/``model_args``)
        carries the per-step mini-batch context so amortized guides can
        encode the same batch the model sees (SURVEY.md C6/C20)."""
        raise NotImplementedError


class MeanFieldGuide(Guide):
    """Diagonal Gaussian q(u) = N(loc, diag(exp(log_scale))^2)."""

    def __init__(self, info, init_scale=0.1):
        self.dim, self.unravel, self.ravel = unraveler(info)
        self.init_scale = float(init_scale)

    def init(self, key, loc=None):
        if loc is None:
            loc = jnp.zeros(self.dim)
        else:
            loc = self.ravel(loc) if isinstance(loc, dict) else loc
        return {
            "loc": loc,
            "log_scale": jnp.full(self.dim, math.log(self.init_scale)),
        }

    def sample_and_log_prob(self, params, key, sample_shape=(),
                            stop_gradient_q=False, ctx=None):
        eps = jax.random.normal(key, tuple(sample_shape) + (self.dim,),
                                jnp.result_type(float))
        flat = params["loc"] + jnp.exp(params["log_scale"]) * eps
        q_params = jax.lax.stop_gradient(params) if stop_gradient_q else params
        z = (flat - q_params["loc"]) * jnp.exp(-q_params["log_scale"])
        logq = jnp.sum(
            -0.5 * z * z - q_params["log_scale"] - 0.5 * _LOG_2PI, -1
        )
        return self.unravel(flat), logq

    def entropy(self, params):
        return jnp.sum(params["log_scale"]) \
            + 0.5 * self.dim * (1.0 + _LOG_2PI)

    def stats(self, params):
        """Unconstrained-space posterior mean/std per site."""
        return (
            self.unravel(params["loc"]),
            self.unravel(jnp.exp(params["log_scale"])),
        )


class FullRankGuide(Guide):
    """Full-covariance Gaussian q(u) = N(loc, L L^T), L parameterized as a
    packed lower-Cholesky vector with log-diagonal (SURVEY.md C6)."""

    def __init__(self, info, init_scale=0.1):
        self.dim, self.unravel, self.ravel = unraveler(info)
        self.init_scale = float(init_scale)
        self._tril = LowerCholeskyTransform()
        self._nvec = self.dim * (self.dim + 1) // 2

    def init(self, key, loc=None):
        if loc is None:
            loc = jnp.zeros(self.dim)
        else:
            loc = self.ravel(loc) if isinstance(loc, dict) else loc
        # packed vec with diag entries = log(init_scale), off-diag 0
        vec = jnp.zeros(self._nvec)
        pos = jnp.array([k * (k + 1) // 2 + k for k in range(self.dim)])
        vec = vec.at[pos].set(math.log(self.init_scale))
        return {"loc": loc, "scale_tril_vec": vec}

    def _chol(self, params):
        return self._tril.forward(params["scale_tril_vec"])

    def sample_and_log_prob(self, params, key, sample_shape=(),
                            stop_gradient_q=False, ctx=None):
        eps = jax.random.normal(key, tuple(sample_shape) + (self.dim,),
                                jnp.result_type(float))
        chol = self._chol(params)
        flat = params["loc"] + eps @ chol.T
        q_params = jax.lax.stop_gradient(params) if stop_gradient_q else params
        q_chol = self._chol(q_params)
        diff = flat - q_params["loc"]
        chol_b = jnp.broadcast_to(q_chol, diff.shape[:-1] + q_chol.shape)
        z = jax.scipy.linalg.solve_triangular(
            chol_b, diff[..., None], lower=True
        )[..., 0]
        half_logdet = jnp.sum(jnp.log(jnp.diagonal(q_chol)))
        logq = (
            -0.5 * jnp.sum(z * z, -1) - half_logdet
            - 0.5 * self.dim * _LOG_2PI
        )
        return self.unravel(flat), logq

    def entropy(self, params):
        return jnp.sum(jnp.log(jnp.diagonal(self._chol(params)))) \
            + 0.5 * self.dim * (1.0 + _LOG_2PI)

    def stats(self, params):
        chol = self._chol(params)
        std = jnp.sqrt(jnp.sum(chol * chol, -1))
        return self.unravel(params["loc"]), self.unravel(std)

    def covariance(self, params):
        chol = self._chol(params)
        return chol @ chol.T


class NeuralGuide(Guide):
    """Adapter for amortized guides (configs[4], SURVEY.md C6/C20): the user
    supplies ``init_fn(key) -> params`` and ``sample_fn(params, key,
    sample_shape, stop_gradient_q) -> (uparams, logq)`` (typically a flax
    encoder producing per-datapoint Gaussian parameters)."""

    def __init__(self, init_fn, sample_fn):
        self._init_fn = init_fn
        self._sample_fn = sample_fn

    def init(self, key):
        return self._init_fn(key)

    def sample_and_log_prob(self, params, key, sample_shape=(),
                            stop_gradient_q=False, ctx=None):
        return self._sample_fn(params, key, sample_shape, stop_gradient_q,
                               ctx)
