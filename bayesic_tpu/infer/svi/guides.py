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
           "LowRankGuide", "NeuralGuide", "TraceGuide"]

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


class LowRankGuide(Guide):
    """Low-rank-plus-diagonal Gaussian q(u) = N(loc, W W^T + diag(d^2)),
    W in R^{dim x rank} (SURVEY.md C6 — the middle ground between
    MeanFieldGuide and FullRankGuide: captures the ``rank`` dominant
    posterior correlation directions at O(dim*rank) parameters/memory
    instead of O(dim^2), which is what makes correlated guides viable at
    the dimensions where FullRankGuide's Cholesky no longer fits).

    Density and entropy use the Woodbury identity and the matrix
    determinant lemma so every step is O(dim*rank^2) with one (rank,rank)
    Cholesky — no dim x dim matrix is ever formed:

      cap      = I_r + W^T D^{-1} W                (D = diag(d^2))
      logdet Σ = logdet(cap) + sum log d^2
      Σ^{-1} x = D^{-1} x - D^{-1} W cap^{-1} W^T D^{-1} x
    """

    def __init__(self, info, rank=2, init_scale=0.1):
        self.dim, self.unravel, self.ravel = unraveler(info)
        self.rank = int(rank)
        if not 0 < self.rank <= self.dim:
            raise ValueError(
                f"rank must be in [1, dim={self.dim}], got {rank}")
        self.init_scale = float(init_scale)

    def init(self, key, loc=None):
        if loc is None:
            loc = jnp.zeros(self.dim)
        else:
            loc = self.ravel(loc) if isinstance(loc, dict) else loc
        # W = 0 is a saddle point of the ELBO (dΣ = dW·Wᵀ + W·dWᵀ vanishes
        # there, so the gradient is ∝ W and escape is exponentially slow);
        # break the symmetry with a factor sized so the low-rank part
        # contributes ~10% of the initial marginal variance
        w = (0.3 * self.init_scale / math.sqrt(self.rank)) \
            * jax.random.normal(key, (self.dim, self.rank),
                                jnp.result_type(float))
        return {
            "loc": loc,
            "w": w,
            "log_diag": jnp.full(self.dim, math.log(self.init_scale)),
        }

    @staticmethod
    def _cap_chol(params):
        """Cholesky of cap = I_r + W^T D^{-1} W  (rank x rank)."""
        w, log_diag = params["w"], params["log_diag"]
        dinv_w = w * jnp.exp(-2.0 * log_diag)[:, None]
        cap = jnp.eye(w.shape[1], dtype=w.dtype) + w.T @ dinv_w
        return jnp.linalg.cholesky(cap), dinv_w

    def _log_prob(self, q_params, flat):
        chol, dinv_w = self._cap_chol(q_params)
        log_diag = q_params["log_diag"]
        diff = flat - q_params["loc"]
        # quadratic form via Woodbury: diffᵀD⁻¹diff − mᵀ cap⁻¹ m,
        # m = Wᵀ D⁻¹ diff
        z2 = jnp.sum(diff * diff * jnp.exp(-2.0 * log_diag), -1)
        m = diff @ dinv_w
        chol_b = jnp.broadcast_to(chol, m.shape[:-1] + chol.shape)
        y = jax.scipy.linalg.solve_triangular(chol_b, m[..., None],
                                              lower=True)[..., 0]
        quad = z2 - jnp.sum(y * y, -1)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol))) \
            + 2.0 * jnp.sum(log_diag)
        return -0.5 * (quad + logdet + self.dim * _LOG_2PI)

    def sample_and_log_prob(self, params, key, sample_shape=(),
                            stop_gradient_q=False, ctx=None):
        kd, kr = jax.random.split(key)
        shape = tuple(sample_shape)
        dtype = jnp.result_type(float)
        eps_d = jax.random.normal(kd, shape + (self.dim,), dtype)
        eps_r = jax.random.normal(kr, shape + (self.rank,), dtype)
        flat = params["loc"] + jnp.exp(params["log_diag"]) * eps_d \
            + eps_r @ params["w"].T
        q_params = jax.lax.stop_gradient(params) if stop_gradient_q \
            else params
        return self.unravel(flat), self._log_prob(q_params, flat)

    def entropy(self, params):
        chol, _ = self._cap_chol(params)
        half_logdet = jnp.sum(jnp.log(jnp.diagonal(chol))) \
            + jnp.sum(params["log_diag"])
        return half_logdet + 0.5 * self.dim * (1.0 + _LOG_2PI)

    def stats(self, params):
        var = jnp.exp(2.0 * params["log_diag"]) \
            + jnp.sum(params["w"] * params["w"], -1)
        return self.unravel(params["loc"]), self.unravel(jnp.sqrt(var))

    def covariance(self, params):
        """Dense (dim, dim) covariance — diagnostics/tests only."""
        w = params["w"]
        return w @ w.T + jnp.diag(jnp.exp(2.0 * params["log_diag"]))


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


class TraceGuide(Guide):
    """DSL-authored custom guide (SURVEY.md C6 "custom guides"): any model-
    like function using ``param`` sites for its learnables and ``sample``
    sites (in constrained space) for the model's latents.

    Example::

        def guide():
            loc = param("mu_loc", jnp.zeros(()))
            scale = param("mu_scale", jnp.asarray(0.1),
                          constraint=constraints.positive)
            sample("mu", dist.Normal(loc, scale))

    The ELBO machinery works in unconstrained space, so sampled values are
    pulled back through the model's bijectors with the change-of-variable
    correction: ``log q_u(u) = log q_x(T(u)) + log|dT/du|``.
    """

    def __init__(self, guide_fn, model_info, guide_args=(),
                 guide_kwargs=None):
        from ...core import handlers
        from ...dist.transforms import biject_to

        self._handlers = handlers
        self.guide_fn = guide_fn
        self.info = model_info
        self._args = guide_args
        self._kwargs = guide_kwargs or {}

        tr = handlers.trace(
            handlers.seed(guide_fn, rng_key=jax.random.PRNGKey(0))
        ).get_trace(*self._args, **self._kwargs)
        self.param_transforms = {}
        self.param_init = {}
        latent_sites = []
        for name, site in tr.items():
            if site["type"] == "param":
                t = biject_to(site["constraint"])
                self.param_transforms[name] = t
                self.param_init[name] = t.inverse(site["value"])
            elif site["type"] == "sample" and not site["is_observed"]:
                latent_sites.append(name)
        missing = set(model_info.latent_names) - set(latent_sites)
        if missing:
            raise ValueError(
                f"guide does not sample model latent site(s): "
                f"{sorted(missing)}"
            )

    def init(self, key):
        return dict(self.param_init)

    def _replay(self, params_u, key):
        h = self._handlers
        values = {
            n: self.param_transforms[n].forward(params_u[n])
            for n in self.param_transforms
        }
        return h.trace(
            h.substitute(h.seed(self.guide_fn, rng_key=key), data=values)
        ).get_trace(*self._args, **self._kwargs)

    def sample_and_log_prob(self, params, key, sample_shape=(),
                            stop_gradient_q=False, ctx=None):
        q_params = jax.lax.stop_gradient(params) if stop_gradient_q \
            else params

        def one(k):
            tr = self._replay(params, k)
            xs = {
                n: tr[n]["value"] for n in self.info.latent_names
            }
            # log q at the sampled point, with params possibly stopped (STL)
            tr_q = self._handlers.trace(
                self._handlers.substitute(
                    self._handlers.seed(self.guide_fn,
                                        rng_key=jax.random.PRNGKey(0)),
                    data={
                        **{
                            n: self.param_transforms[n].forward(q_params[n])
                            for n in self.param_transforms
                        },
                        **xs,
                    },
                )
            ).get_trace(*self._args, **self._kwargs)
            logq = jnp.zeros(())
            uparams = {}
            for n in self.info.latent_names:
                site = tr_q[n]
                lp = jnp.sum(site["dist"].log_prob(site["value"]))
                t = self.info.transforms[n]
                u = t.inverse(site["value"])
                ldj = jnp.sum(t.log_det_jacobian(u))
                logq = logq + lp + ldj
                uparams[n] = u
            return uparams, logq

        if sample_shape == ():
            return one(key)
        import math as _math

        n_keys = int(_math.prod(sample_shape))
        keys = jax.vmap(
            lambda i: jax.random.fold_in(key, i)
        )(jnp.arange(n_keys))
        us, logqs = jax.vmap(one)(keys)
        shape = tuple(sample_shape)
        us = jax.tree_util.tree_map(
            lambda a: a.reshape(shape + a.shape[1:]), us
        )
        return us, logqs.reshape(shape)
