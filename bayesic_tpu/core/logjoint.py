"""Joint log-prob compiler: model graph -> pure-JAX density in unconstrained
space.

Blueprint: SURVEY.md C4 — "model graph → pure-JAX ``log_joint(unconstrained
params, data) -> scalar``; applies transforms+Jacobians; applies plate
subsampling scale factors; fully jit/vmap-able" (BASELINE.json north_star:
"the model graph compiles to pure JAX: vectorized joint log-prob
evaluation").

The compiler traces the model once to discover sites, then emits closures
that replay it under ``substitute``; every replay happens at JAX trace time,
so the resulting ``logdensity`` is a single fused XLA computation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from ..dist.transforms import biject_to
from . import handlers
from .primitives import sample  # noqa: F401  (re-export convenience)

__all__ = ["ModelInfo", "inspect_model", "build_logjoint", "Potential",
           "init_to_uniform", "init_to_prior"]


class ModelInfo(NamedTuple):
    """Static description of a model's site graph (from one discovery trace)."""

    latent_names: tuple
    observed_names: tuple
    deterministic_names: tuple
    transforms: dict          # latent name -> Transform (unconstrained -> support)
    site_shapes: dict         # latent name -> constrained shape
    unconstrained_shapes: dict  # latent name -> unconstrained shape
    has_subsample: bool
    subsample_sites: dict     # "{plate}__idx" -> (size, subsample_size)
    param_names: tuple        # learnable model params (SURVEY.md C3 `param`)
    param_transforms: dict    # param name -> Transform
    param_init: dict          # param name -> unconstrained init value
    enum_sites: dict          # enumerated discrete site -> support size

    @property
    def unconstrained_dim(self):
        import math
        return sum(
            math.prod(s) if s else 1
            for s in self.unconstrained_shapes.values()
        )


def _model_trace(model, args, kwargs, key):
    return handlers.trace(
        handlers.seed(model, rng_key=key)
    ).get_trace(*args, **kwargs)


def inspect_model(model, *args, rng_key=None, **kwargs) -> ModelInfo:
    key = rng_key if rng_key is not None else jax.random.PRNGKey(0)
    tr = _model_trace(model, args, kwargs, key)
    latents, observed, deterministics = [], [], []
    transforms, shapes, ushapes, subsample_sites = {}, {}, {}, {}
    param_names, param_transforms, param_init = [], {}, {}
    enum_sites = {}
    has_subsample = False
    for name, site in tr.items():
        if site["type"] == "sample":
            if site["is_observed"]:
                observed.append(name)
            else:
                if site.get("infer", {}).get("enumerate"):
                    enum_sites[name] = _enum_support_size(name, site["dist"])
                    continue
                if site["dist"].support.is_discrete:
                    raise ValueError(
                        f"latent site {name!r} is discrete — marginalise it "
                        f"(MixtureSameFamily), observe it, or mark it "
                        f"infer={{'enumerate': True}} (scalar sites)."
                    )
                latents.append(name)
                t = biject_to(site["dist"].support)
                transforms[name] = t
                shapes[name] = jnp.shape(site["value"])
                ushapes[name] = t.inverse_shape(jnp.shape(site["value"]))
        elif site["type"] == "deterministic":
            deterministics.append(name)
        elif site["type"] == "subsample":
            if site["subsample_size"] is not None \
                    and site["subsample_size"] < site["size"]:
                has_subsample = True
                subsample_sites[name] = (site["size"], site["subsample_size"])
        elif site["type"] == "param":
            t = biject_to(site["constraint"])
            param_transforms[name] = t
            if site["value"] is None:
                raise ValueError(f"param site {name!r} needs init_value=")
            param_init[name] = t.inverse(site["value"])
            param_names.append(name)
    return ModelInfo(
        tuple(latents), tuple(observed), tuple(deterministics),
        transforms, shapes, ushapes, has_subsample, subsample_sites,
        tuple(param_names), param_transforms, param_init, enum_sites,
    )


def _enum_support_size(name, d):
    if jnp.shape(d.sample(jax.random.PRNGKey(0))) != ():
        raise ValueError(
            f"enumerate only supports scalar discrete sites; {name!r} has "
            f"batch/event dims (use MixtureSameFamily for per-datapoint "
            f"assignments)"
        )
    if hasattr(d, "num_categories"):
        return int(d.num_categories)
    from ..dist import constraints as _c

    if isinstance(d.support, _c._Boolean):
        return 2
    raise ValueError(
        f"cannot enumerate {name!r}: support size unknown for "
        f"{type(d).__name__} (Categorical/Bernoulli supported)"
    )


def init_to_prior(model, info, *args, rng_key=None, **kwargs):
    """Initial unconstrained params from one prior draw."""
    key = rng_key if rng_key is not None else jax.random.PRNGKey(0)
    tr = _model_trace(model, args, kwargs, key)
    return {
        n: info.transforms[n].inverse(tr[n]["value"]) for n in info.latent_names
    }


def init_to_uniform(info, rng_key, radius=2.0):
    """Stan-style init: u ~ Uniform(-radius, radius) per coordinate."""
    out = {}
    for i, n in enumerate(info.latent_names):
        k = jax.random.fold_in(rng_key, i)
        out[n] = jax.random.uniform(
            k, info.unconstrained_shapes[n], jnp.result_type(float),
            -radius, radius,
        )
    return out


def build_logjoint(model, *args, **kwargs):
    """Compile ``model`` into pure-JAX callables.

    Returns ``(info, logdensity, constrain, postprocess)`` where

    * ``logdensity(uparams, rng_key=None, subsample=None) -> scalar``:
      joint log-density (model density + change-of-variable Jacobians) at the
      unconstrained pytree ``uparams``.  ``rng_key`` only matters for models
      with subsampled plates (fresh mini-batch per call); ``subsample`` forces
      specific ``"{plate}__idx"`` index arrays instead.
    * ``constrain(uparams) -> dict``: latent values in the support.
    * ``postprocess(uparams, rng_key=None) -> dict``: constrained latents plus
      deterministic sites (full replay).
    """
    info = inspect_model(model, *args, **kwargs)

    def _replay(uparams, rng_key, subsample, model_args=None,
                model_kwargs=None, params=None):
        values = {
            n: info.transforms[n].forward(uparams[n])
            for n in info.latent_names
        }
        data = dict(values)
        if subsample:
            data.update(subsample)
        if params is not None:
            data.update({
                n: info.param_transforms[n].forward(params[n])
                for n in info.param_names
            })
        key = rng_key if rng_key is not None else jax.random.PRNGKey(0)
        call_args = args if model_args is None else model_args
        call_kwargs = kwargs if model_kwargs is None else model_kwargs
        tr = handlers.trace(
            handlers.substitute(
                handlers.seed(model, rng_key=key), data=data
            )
        ).get_trace(*call_args, **call_kwargs)
        return tr, values

    def _accumulate(tr, uparams):
        total = jnp.zeros((), jnp.result_type(float))
        for name, site in tr.items():
            if site["type"] == "sample":
                lp = site["dist"].log_prob(site["value"])
                total = total + site["scale"] * jnp.sum(lp)
                if name in info.transforms:
                    ldj = info.transforms[name].log_det_jacobian(uparams[name])
                    total = total + site["scale"] * jnp.sum(ldj)
            elif site["type"] == "factor":
                total = total + site["scale"] * jnp.sum(site["value"])
        return total

    def logdensity(uparams, rng_key=None, subsample=None, model_args=None,
                   model_kwargs=None, params=None):
        # model_args/model_kwargs override the build-time arguments; pass the
        # (sharded) data pytree here so it is a traced jit input rather than a
        # baked constant (SURVEY.md C12: data-parallel SVI).  ``params`` is a
        # dict of *unconstrained* values for learnable `param` sites (e.g. a
        # DLGM decoder, SURVEY.md C20) optimized jointly with the ELBO.
        if not info.enum_sites:
            tr, _ = _replay(uparams, rng_key, subsample, model_args,
                            model_kwargs, params)
            return _accumulate(tr, uparams)
        # marginalise enumerated scalar discrete sites: replay per combo of
        # the (static, small) product support and logsumexp the joints
        import itertools

        names = sorted(info.enum_sites)
        lps = []
        for combo in itertools.product(
            *[range(info.enum_sites[n]) for n in names]
        ):
            assign = {
                n: jnp.asarray(v, jnp.int32) for n, v in zip(names, combo)
            }
            sub = dict(subsample or {})
            sub.update(assign)
            tr, _ = _replay(uparams, rng_key, sub, model_args,
                            model_kwargs, params)
            lps.append(_accumulate(tr, uparams))
        from jax.scipy.special import logsumexp as _lse

        return _lse(jnp.stack(lps))

    def logdensity_parts(uparams, rng_key=None, subsample=None,
                         model_args=None, model_kwargs=None):
        """(log prior + Jacobians, log likelihood) — the split tempered SMC
        needs (SURVEY.md C9: p_beta ∝ prior · lik^beta)."""
        tr, _ = _replay(uparams, rng_key, subsample, model_args, model_kwargs)
        ftype = jnp.result_type(float)
        log_prior = jnp.zeros((), ftype)
        log_lik = jnp.zeros((), ftype)
        for name, site in tr.items():
            if site["type"] == "sample":
                lp = site["scale"] * jnp.sum(site["dist"].log_prob(
                    site["value"]))
                if site["is_observed"]:
                    log_lik = log_lik + lp
                else:
                    ldj = info.transforms[name].log_det_jacobian(uparams[name])
                    log_prior = log_prior + lp + site["scale"] * jnp.sum(ldj)
            elif site["type"] == "factor":
                log_lik = log_lik + site["scale"] * jnp.sum(site["value"])
        return log_prior, log_lik

    def constrain(uparams):
        return {
            n: info.transforms[n].forward(uparams[n])
            for n in info.latent_names
        }

    def postprocess(uparams, rng_key=None):
        tr, values = _replay(uparams, rng_key, None)
        out = dict(values)
        for n in info.deterministic_names:
            out[n] = tr[n]["value"]
        return out

    logdensity.parts = logdensity_parts
    return info, logdensity, constrain, postprocess


class Potential:
    """Flat-vector view of a log-joint for HMC/NUTS (SURVEY.md C8): the
    negative log-density over a single raveled parameter vector."""

    def __init__(self, logdensity, uparams_example):
        flat, unravel = ravel_pytree(uparams_example)
        self.unravel = unravel
        self.dim = flat.shape[0]
        self.example_flat = flat
        self._logdensity = logdensity

    def __call__(self, q, **kw):
        return -self._logdensity(self.unravel(q), **kw)

    def value_and_grad(self, q, **kw):
        return jax.value_and_grad(self.__call__)(q, **kw)
