"""Stochastic-gradient MCMC: SGLD, pSGLD and SGHMC.

Blueprint: SURVEY.md C8 periphery / C5 subsampling — the minibatch-scale
sampling complement to SVI for models too large for full-batch NUTS: the
gradient of the log-joint is estimated on a subsampled plate (the same
``draw_subsample`` + N/B scaling machinery the ELBO uses, SURVEY.md C4/C5),
and the chain injects calibrated Gaussian noise instead of a
Metropolis correction:

  SGLD   (Welling & Teh 2011):   q += (e/2) grad + N(0, e)
  pSGLD  (Li et al. 2016):       RMSProp-preconditioned SGLD (the C10
                                 optimizer idiom applied to sampling)
  SGHMC  (Chen et al. 2014):     v = (1-a) v + e grad + N(0, 2a e);  q += v

All run as ONE ``lax.scan`` program over steps with vectorized chains
(SURVEY.md C13a conventions: per-chain PRNG by logical index, chains
shardable via ``chain_sharding``), with in-scan thinning so the output
buffer holds only kept draws.  Bias note: without Metropolis correction the
stationary distribution is exact only as ``step_size -> 0``; use the
polynomial decay schedule (``step_decay``) for asymptotic correctness, or a
small constant step for a controlled-bias approximation (both standard).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.logjoint import build_logjoint, init_to_uniform

__all__ = ["SGMCMC", "SGMCMCResult"]


class SGMCMCResult(NamedTuple):
    samples: dict             # site -> (chains, kept, *event) constrained
    unconstrained: jax.Array  # (chains, kept, dim)
    extra: dict               # grad_norm trace, step sizes


class SGMCMC:
    """``SGMCMC(model, method="sgld" | "psgld" | "sghmc", ...)``.

    ``step_size`` is the initial step; with ``step_decay=(a, b, gamma)``
    the step at t is ``a / (b + t)**gamma`` (Welling & Teh's schedule,
    ``step_size`` ignored); default is constant.
    """

    def __init__(self, model=None, *, method="sgld", num_samples=1000,
                 num_burnin=500, num_chains=4, thin=1, step_size=1e-3,
                 step_decay: Optional[tuple] = None, friction=0.1,
                 rmsprop_decay=0.99, rmsprop_eps=1e-5,
                 model_args=(), model_kwargs=None, chain_sharding=None):
        if method not in ("sgld", "psgld", "sghmc"):
            raise ValueError(f"unknown method {method!r}")
        self.method = method
        self.num_samples = int(num_samples)
        self.num_burnin = int(num_burnin)
        self.num_chains = int(num_chains)
        self.thin = int(thin)
        self.step_size = float(step_size)
        self.step_decay = step_decay
        self.friction = float(friction)
        self.rmsprop_decay = float(rmsprop_decay)
        self.rmsprop_eps = float(rmsprop_eps)
        self.chain_sharding = chain_sharding

        info, logdensity, constrain_fn, _ = build_logjoint(
            model, *model_args, **(model_kwargs or {})
        )
        from .svi.elbo import draw_subsample
        from .svi.guides import unraveler
        dim, unravel_fn, ravel_fn = unraveler(info)
        self.info = info
        self.dim = dim
        self._ravel = ravel_fn
        self._constrain = lambda q: constrain_fn(unravel_fn(q))
        self._has_sub = info.has_subsample

        def grad_logp(q, key_batch):
            sub = (draw_subsample(info, key_batch)
                   if info.has_subsample else None)
            return jax.value_and_grad(
                lambda qq: logdensity(unravel_fn(qq), subsample=sub)
            )(q)

        self._grad_logp = grad_logp

    # ------------------------------------------------------------------
    def _step_at(self, t):
        if self.step_decay is None:
            return jnp.asarray(self.step_size)
        a, b, gamma = self.step_decay
        return a / (b + t.astype(jnp.float32)) ** gamma

    def _transition(self, key, carry, t):
        """One update for a single chain. carry = (q, aux) with aux the
        method state (momentum for sghmc, RMS accumulator for psgld)."""
        q, aux = carry
        key_b, key_n = jax.random.split(key)
        eps = self._step_at(t)
        _, g = self._grad_logp(q, key_b)
        noise = jax.random.normal(key_n, q.shape)

        if self.method == "sgld":
            q = q + 0.5 * eps * g + jnp.sqrt(eps) * noise
            gn = jnp.sqrt(jnp.sum(g * g))
            return (q, aux), gn
        if self.method == "psgld":
            vsq = self.rmsprop_decay * aux + (1 - self.rmsprop_decay) * g * g
            prec = 1.0 / (jnp.sqrt(vsq) + self.rmsprop_eps)
            q = (q + 0.5 * eps * prec * g
                 + jnp.sqrt(eps * prec) * noise)
            gn = jnp.sqrt(jnp.sum(g * g))
            return (q, vsq), gn
        # sghmc: v in "per-step displacement" parameterization
        a = self.friction
        v = ((1.0 - a) * aux + eps * g
             + jnp.sqrt(2.0 * a * eps) * noise)
        q = q + v
        gn = jnp.sqrt(jnp.sum(g * g))
        return (q, v), gn

    def _init_aux(self, q):
        if self.method == "psgld":
            return jnp.ones_like(q)
        return jnp.zeros_like(q)   # sghmc momentum; unused for sgld

    # ------------------------------------------------------------------
    def run(self, key) -> SGMCMCResult:
        key_init, key_run = jax.random.split(key)

        def init_one(c):
            k = jax.random.fold_in(key_init, c)
            q = self._ravel(init_to_uniform(self.info, k))
            return q, self._init_aux(q)

        carry0 = jax.vmap(init_one)(jnp.arange(self.num_chains))
        if self.chain_sharding is not None:
            carry0 = jax.device_put(carry0, self.chain_sharding)

        total = self.num_burnin + self.num_samples * self.thin
        kept_every = self.thin

        if not hasattr(self, "_run_fn"):
            def one_t(kr, carry, t):
                keys = jax.vmap(
                    lambda c: jax.random.fold_in(jax.random.fold_in(kr, t),
                                                 c)
                )(jnp.arange(self.num_chains))
                (q, aux), gn = jax.vmap(
                    lambda k, qq, aa: self._transition(k, (qq, aa), t)
                )(keys, *carry)
                return (q, aux), gn

            def run_all(kr, c0):
                def burn(carry, t):
                    carry, gn = one_t(kr, carry, t)
                    return carry, gn

                carry, _ = lax.scan(burn, c0,
                                    jnp.arange(self.num_burnin))

                def samp(carry, i):
                    def inner(j, c):
                        c, _ = one_t(kr, c,
                                     self.num_burnin + i * kept_every + j)
                        return c

                    carry = lax.fori_loop(0, kept_every - 1, inner, carry)
                    carry, gn = one_t(
                        kr, carry,
                        self.num_burnin + i * kept_every + kept_every - 1)
                    return carry, (carry[0], gn)

                _, (qs, gns) = lax.scan(samp, carry,
                                        jnp.arange(self.num_samples))
                return qs, gns

            self._run_fn = jax.jit(run_all)

        qs, gns = self._run_fn(key_run, carry0)
        qs = jnp.swapaxes(qs, 0, 1)            # (chains, kept, dim)
        flat = qs.reshape(-1, self.dim)
        cons = jax.vmap(self._constrain)(flat)
        samples = {name: val.reshape(qs.shape[:2] + val.shape[1:])
                   for name, val in cons.items()}
        extra = {
            "grad_norm": jnp.swapaxes(gns, 0, 1),
            "final_step_size": self._step_at(jnp.asarray(total)),
            "method": self.method,
        }
        return SGMCMCResult(samples, qs, extra)
