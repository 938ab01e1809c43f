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
    subsample_sites: dict     # "{plate}__idx" -> (size, subsample_size, replacement)
    param_names: tuple        # learnable model params (SURVEY.md C3 `param`)
    param_transforms: dict    # param name -> Transform
    param_init: dict          # param name -> unconstrained init value
    enum_sites: dict          # enumerated discrete site -> support size
    # NOTE: no mutable {} default — a class-level dict would be shared
    # across every instance constructed without the field
    enum_shapes: dict = None  # enumerated site -> natural (non-enum) shape
    enum_pad: int = 0         # max natural value rank across all sites (P)

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
    enum_sites, enum_shapes = {}, {}
    has_subsample = False
    enum_pad = 0
    for site in tr.values():
        if site["type"] in ("sample", "factor"):
            enum_pad = max(enum_pad, len(jnp.shape(site["value"])))
    for name, site in tr.items():
        if site["type"] == "sample":
            if site["is_observed"]:
                observed.append(name)
            else:
                if site.get("infer", {}).get("enumerate"):
                    enum_sites[name] = _enum_support_size(name, site["dist"])
                    enum_shapes[name] = jnp.shape(site["value"])
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
                subsample_sites[name] = (
                    site["size"], site["subsample_size"],
                    site.get("replacement", True),
                )
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
        enum_shapes, enum_pad,
    )


def _enum_support_size(name, d):
    """Support size of an enumerable discrete site (scalar or plate-batched;
    batched sites are marginalised per element, SURVEY.md C4)."""
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

    def _apply_mask(site, lp):
        # handlers.mask: elementwise-excluded terms contribute exactly zero
        m = site.get("mask")
        return lp if m is None else jnp.where(m, lp, jnp.zeros((), lp.dtype))

    def _accumulate(tr, uparams):
        total = jnp.zeros((), jnp.result_type(float))
        for name, site in tr.items():
            if site["type"] == "sample":
                lp = _apply_mask(site, site["dist"].log_prob(site["value"]))
                total = total + site["scale"] * jnp.sum(lp)
                if name in info.transforms:
                    ldj = _apply_mask(site, info.transforms[name]
                                      .log_det_jacobian(uparams[name]))
                    total = total + site["scale"] * jnp.sum(ldj)
            elif site["type"] == "factor":
                lp = _apply_mask(site, jnp.asarray(site["value"]))
                total = total + site["scale"] * jnp.sum(lp)
        return total

    # -- vectorized discrete enumeration (SURVEY.md C4) ---------------------
    # Each enumerated site e gets a distinct leading enumeration axis: its
    # substituted value is arange(K_e) shaped (K_e, 1...[E-1-e ones], 1...[P
    # ones]) so all enum axes and the natural (model) dims broadcast through
    # ONE replay; the enum axes are then marginalised by variable
    # elimination.  Batched (plate-local) sites are marginalised per plate
    # element — the dependent terms' batch shapes must right-align with the
    # site's batch shape (the usual broadcast-enumeration contract).
    _enum_names = sorted(info.enum_sites)
    _E = len(_enum_names)
    _P = info.enum_pad

    def _enum_assign():
        out = {}
        for e, n in enumerate(_enum_names):
            k = info.enum_sites[n]
            out[n] = jnp.arange(k, dtype=jnp.int32).reshape(
                (k,) + (1,) * (_E - 1 - e) + (1,) * _P
            )
        return out

    def _collect_terms(tr, uparams):
        """(lp, scale, is_lik) per sample/factor term, left-padded to rank
        E+P: enum axis e sits at position e, natural dims right-aligned in
        the trailing P slots."""
        full_rank = _E + _P
        terms = []

        def pad(x):
            x = jnp.asarray(x)
            if x.ndim > full_rank:
                raise ValueError(
                    f"enumeration produced a log-prob of rank {x.ndim} > "
                    f"{full_rank}; model shapes must stay within the "
                    "discovery-trace ranks"
                )
            return x.reshape((1,) * (full_rank - x.ndim) + x.shape)

        for name, site in tr.items():
            if site["type"] == "sample":
                lp = _apply_mask(site, site["dist"].log_prob(site["value"]))
                terms.append((pad(lp), site["scale"], site["is_observed"]))
                if name in info.transforms:
                    ldj = _apply_mask(site, info.transforms[name]
                                      .log_det_jacobian(uparams[name]))
                    terms.append((pad(ldj), site["scale"], False))
            elif site["type"] == "factor":
                lp = _apply_mask(site, jnp.asarray(site["value"]))
                terms.append((pad(lp), site["scale"], True))
        return terms

    # Elimination ORDER matters when scalar and plate-local sites
    # interact: a scalar site's elimination sums the plate axes, so any
    # still-live plate-local axis would be coupled across elements
    # (confirmed wrong vs brute force).  Eliminate plate-local sites
    # (higher natural rank) FIRST — their per-element marginals then sum
    # correctly under later scalar eliminations.
    _elim_order = sorted(
        range(_E),
        key=lambda i: (-len(info.enum_shapes[_enum_names[i]]), -i),
    )

    def _check_no_cross_plate(involved, e):
        r_e = len(info.enum_shapes[_enum_names[e]])
        for lp, *_ in involved:
            for f in range(_E):
                if f != e and lp.shape[f] != 1                         and len(info.enum_shapes[_enum_names[f]]) > 0                         and r_e != len(info.enum_shapes[_enum_names[f]]):
                    raise ValueError(
                        "enumerated plate-local sites interacting across "
                        "plates of different ranks are unsupported "
                        f"({_enum_names[e]!r} with {_enum_names[f]!r})"
                    )

    def _eliminate(terms):
        """Marginalise the enum axes by vectorized variable elimination:
        for each enum axis (plate-local sites first — see _elim_order),
        sum the involved terms' natural dims down to the site's own plate
        dims, add them elementwise, and logsumexp the axis away.  K
        scalar sites cost K eliminations of one K-vector each — not K^n
        replays."""
        from jax.scipy.special import logsumexp as _lse

        terms = list(terms)
        for e in _elim_order:
            r_e = len(info.enum_shapes[_enum_names[e]])
            involved = [t for t in terms if t[0].shape[e] != 1]
            if not involved:
                continue
            _check_no_cross_plate(involved, e)
            rest = [t for t in terms if t[0].shape[e] == 1]
            # reduce natural axes to the left of the site's (right-aligned)
            # plate dims — they belong to independent plates and sum freely
            red = tuple(range(_E, _E + _P - r_e))
            if red:
                involved = [(jnp.sum(lp, axis=red, keepdims=True), s)
                            for lp, s in involved]
            s0 = involved[0][1]
            if all(s == s0 for _, s in involved):
                combined = involved[0][0]
                for lp, _ in involved[1:]:
                    combined = combined + lp
                terms = rest + [(_lse(combined, axis=e, keepdims=True), s0)]
            else:
                if r_e:
                    raise ValueError(
                        f"enumerated site {_enum_names[e]!r} is plate-local "
                        "but its dependent terms carry different plate "
                        "scales; keep the site and its dependents in the "
                        "same (sub)sampled plate"
                    )
                # scalar site, mixed scales (e.g. prior outside a subsampled
                # plate): scales apply to the fully-reduced terms
                red_all = tuple(range(_E, _E + _P))
                combined = None
                for lp, s in involved:
                    v = s * jnp.sum(lp, axis=red_all, keepdims=True)
                    combined = v if combined is None else combined + v
                terms = rest + [(_lse(combined, axis=e, keepdims=True), 1.0)]
        total = jnp.zeros((), jnp.result_type(float))
        for lp, s in terms:
            total = total + s * jnp.sum(lp)
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
        sub = dict(subsample or {})
        sub.update(_enum_assign())
        tr, _ = _replay(uparams, rng_key, sub, model_args, model_kwargs,
                        params)
        terms = _collect_terms(tr, uparams)
        return _eliminate([(lp, s) for lp, s, _ in terms])

    def logdensity_parts(uparams, rng_key=None, subsample=None,
                         model_args=None, model_kwargs=None, params=None):
        """(log prior + Jacobians, log likelihood) — the split tempered SMC
        needs (SURVEY.md C9: p_beta ∝ prior · lik^beta).

        With enumerated sites both parts are *marginal*:
        ``log_prior = log Σ_z p(θ, z)`` and
        ``log_lik = log p(x | θ) = log Σ_z p(z | θ) p(x | θ, z)`` — computed
        as full marginal joint minus marginal prior, so prior + lik always
        recomposes the marginal joint exactly."""
        if info.enum_sites:
            sub = dict(subsample or {})
            sub.update(_enum_assign())
            tr, _ = _replay(uparams, rng_key, sub, model_args, model_kwargs,
                            params)
            terms = _collect_terms(tr, uparams)
            log_prior = _eliminate(
                [(lp, s) for lp, s, is_lik in terms if not is_lik]
            )
            log_full = _eliminate([(lp, s) for lp, s, _ in terms])
            return log_prior, log_full - log_prior
        tr, _ = _replay(uparams, rng_key, subsample, model_args, model_kwargs,
                        params)
        ftype = jnp.result_type(float)
        log_prior = jnp.zeros((), ftype)
        log_lik = jnp.zeros((), ftype)
        for name, site in tr.items():
            if site["type"] == "sample":
                lp = site["scale"] * jnp.sum(_apply_mask(
                    site, site["dist"].log_prob(site["value"])))
                if site["is_observed"]:
                    log_lik = log_lik + lp
                else:
                    ldj = _apply_mask(site, info.transforms[name]
                                      .log_det_jacobian(uparams[name]))
                    log_prior = log_prior + lp + site["scale"] * jnp.sum(ldj)
            elif site["type"] == "factor":
                log_lik = log_lik + site["scale"] * jnp.sum(
                    _apply_mask(site, jnp.asarray(site["value"])))
        return log_prior, log_lik

    def constrain(uparams):
        return {
            n: info.transforms[n].forward(uparams[n])
            for n in info.latent_names
        }

    def postprocess(uparams, rng_key=None, params=None):
        """``params``: unconstrained values for learnable `param` sites —
        without them, deterministic sites downstream of a trained param
        would be recomputed from the INIT values (r2 review finding)."""
        tr, values = _replay(uparams, rng_key, None, params=params)
        out = dict(values)
        for n in info.deterministic_names:
            out[n] = tr[n]["value"]
        return out

    # -- posterior sampling of enumerated sites (infer_discrete) ------------
    def _index_enum_axis(lp, axis, idx, r_e):
        """Select the sampled assignment of an earlier site: lp indexed at
        ``idx`` (the site's natural-shape int array) along its enum axis,
        keeping the axis with size 1."""
        if lp.shape[axis] == 1:
            return lp
        full_rank = _E + _P
        idxp = jnp.asarray(idx, jnp.int32).reshape(
            (1,) * (_E + (_P - r_e)) + jnp.shape(idx))
        tgt = list(lp.shape)
        tgt[axis] = 1
        idxb = jnp.broadcast_to(idxp, tuple(tgt))
        return jnp.take_along_axis(lp, idxb, axis=axis)

    def sample_enum(uparams, rng_key, model_args=None, model_kwargs=None,
                    params=None):
        """Exact joint posterior draw of all enumerated discrete sites given
        the continuous latents ``uparams`` (NumPyro's ``infer_discrete``):
        sequential ancestral sampling along the site order, each conditional
        obtained by indexing already-sampled sites and eliminating the rest.
        Requires a subsample-free model (conditionals under minibatch
        scaling are not the true conditionals)."""
        if not info.enum_sites:
            return {}
        if info.subsample_sites:
            raise ValueError(
                "sample_enum requires a subsample-free model; rebuild the "
                "log-joint with full plates to recover discrete sites"
            )
        from jax.scipy.special import logsumexp as _lse

        tr, _ = _replay(uparams, rng_key, _enum_assign(), model_args,
                        model_kwargs, params)
        # apply each term's scale up front (handlers.scale tempering must
        # temper the conditionals exactly as it tempers the density); the
        # subsample-free guard above means no N/B plate scales remain
        base_terms = [(lp * s, 1.0)
                      for lp, s, _ in _collect_terms(tr, uparams)]
        out = {}
        # sample in the elimination order (plate-local first) so each
        # conditional's marginalisation of remaining sites is exact
        for pos, e in enumerate(_elim_order):
            name = _enum_names[e]
            r_e = len(info.enum_shapes[name])
            terms = [
                (lp, s) for lp, s in base_terms
            ]
            # index already-sampled sites at their sampled assignments
            for e2 in _elim_order[:pos]:
                n2 = _enum_names[e2]
                r2 = len(info.enum_shapes[n2])
                terms = [(_index_enum_axis(lp, e2, out[n2], r2), s)
                         for lp, s in terms]
            # eliminate not-yet-sampled sites, same order as _eliminate
            for f in _elim_order[pos + 1:]:
                r_f = len(info.enum_shapes[_enum_names[f]])
                involved = [t for t in terms if t[0].shape[f] != 1]
                rest = [t for t in terms if t[0].shape[f] == 1]
                if not involved:
                    continue
                red = tuple(range(_E, _E + _P - r_f))
                if red:
                    involved = [(jnp.sum(lp, axis=red, keepdims=True), s)
                                for lp, s in involved]
                combined = involved[0][0]
                for lp, _ in involved[1:]:
                    combined = combined + lp
                terms = rest + [(_lse(combined, axis=f, keepdims=True),
                                 involved[0][1])]
            # conditional logits over axis e (per plate element for
            # batched sites); terms not involving e are constants
            involved = [t for t in terms if t[0].shape[e] != 1]
            red = tuple(range(_E, _E + _P - r_e))
            if red:
                involved = [(jnp.sum(lp, axis=red, keepdims=True), s)
                            for lp, s in involved]
            logits = involved[0][0]
            for lp, _ in involved[1:]:
                logits = logits + lp
            # collapse remaining singleton axes: (K_e, *site shape)
            keep = (e,) + tuple(range(_E + _P - r_e, _E + _P))
            logits = logits.reshape(
                tuple(logits.shape[a] for a in keep))
            logits = jnp.moveaxis(logits, 0, -1)        # (*site shape, K)
            out[name] = jax.random.categorical(
                jax.random.fold_in(rng_key, e), logits)
        return out

    def logdensity_given_enum(uparams, enum_values, rng_key=None,
                              subsample=None, model_args=None,
                              model_kwargs=None, params=None):
        """Joint log-density with the enumerated sites CONDITIONED at
        ``enum_values`` (int arrays in each site's natural shape) instead of
        marginalised — the conditional density p(u, z=enum_values, data)
        that Gibbs-within-HMC (infer/mcmc/gibbs.py) alternates against.
        Every leapfrog step under this density costs one plain replay (no
        enumeration broadcast), which is the point of the Gibbs scheme."""
        sub = dict(subsample or {})
        sub.update({
            n: jnp.asarray(v, jnp.int32) for n, v in enum_values.items()
        })
        tr, _ = _replay(uparams, rng_key, sub, model_args, model_kwargs,
                        params)
        return _accumulate(tr, uparams)

    logdensity.parts = logdensity_parts
    logdensity.sample_enum = sample_enum
    logdensity.given_enum = logdensity_given_enum
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
