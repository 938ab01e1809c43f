"""Normalizing-flow variational guide (inverse autoregressive flow).

Blueprint: SURVEY.md C6 — the guide family ladder mean-field -> full-rank ->
neural; this module adds the next rung: a non-Gaussian posterior
approximation q(u) built from a diagonal-Gaussian base and a stack of
gated inverse autoregressive flow layers (Kingma et al. 2016) with
MADE-masked (Germain et al. 2015) MLP conditioners.

TPU-native design: VI only ever evaluates log q at the guide's OWN samples,
so both sampling and density ride the *forward* (parallel) IAF direction —
one masked-matmul pass per layer, no sequential inversion anywhere.  All
masks are static 0/1 matrices baked at trace time, so every conditioner is
a dense MXU matmul; the whole sample+logq path is a handful of (B, H) GEMMs.

Layer k (u is the running vector, flip(u) between layers varies ordering):

    (m, s) = MADE_k(u)          # s_j, m_j depend only on u_{<j}
    g      = sigmoid(s + 2)     # +2: near-identity init (g ~ 0.88)
    u      = g * u + (1 - g) * m
    logdet += sum(log g)

log q(u_K) = log N(eps; 0, I) - sum(base log_scale) - sum_k logdet_k.

Sticking-the-landing note: STL needs log q with parameters stopped *at the
sampled point*, which for a flow requires the sequential inverse pass; like
NumPyro's AutoIAF this guide instead keeps the (unbiased, standard
total-derivative) reparameterized estimator and ignores
``stop_gradient_q`` — documented here so SVI(stl=True) semantics are clear.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .guides import _LOG_2PI, Guide, unraveler

__all__ = ["FlowGuide"]


def _made_masks(dim, hidden):
    """Static MADE masks for conditioner MLP dim -> hidden... -> 2*dim.

    Input degrees 1..D; hidden degrees cycle 1..max(D-1,1); output degree
    d: output j may depend on inputs with degree < d(j) (strict), giving
    the autoregressive property.  Returns ([W masks], out_mask)."""
    d_in = np.arange(1, dim + 1)
    masks = []
    prev = d_in
    for h in hidden:
        d_h = (np.arange(h) % max(dim - 1, 1)) + 1
        masks.append((d_h[None, :] >= prev[:, None]).astype(np.float32))
        prev = d_h
    out_mask = (d_in[None, None, :] > prev[:, None, None]).astype(np.float32)
    # (prev_h, 2, dim): same strict mask for both m and s heads
    out_mask = np.broadcast_to(out_mask, (len(prev), 2, dim))
    return [jnp.asarray(m) for m in masks], jnp.asarray(
        out_mask.reshape(len(prev), 2 * dim))


class FlowGuide(Guide):
    """``FlowGuide(info, num_flows=2, hidden=(64, 64))`` — IAF posterior.

    ``stats(params, key, num_draws)`` is Monte-Carlo (the pushforward has
    no closed-form moments)."""

    def __init__(self, info, num_flows=2, hidden=(64, 64), init_scale=0.1):
        self.dim, self.unravel, self.ravel = unraveler(info)
        self.num_flows = int(num_flows)
        self.hidden = tuple(int(h) for h in hidden)
        self.init_scale = float(init_scale)
        self._masks, self._out_mask = _made_masks(self.dim, self.hidden)

    # ------------------------------------------------------------------
    def init(self, key, loc=None):
        if loc is None:
            loc = jnp.zeros(self.dim)
        else:
            loc = self.ravel(loc) if isinstance(loc, dict) else loc
        flows = []
        widths = (self.dim,) + self.hidden
        for k in range(self.num_flows):
            layer = {}
            for i, (a, b) in enumerate(zip(widths[:-1], widths[1:])):
                kk = jax.random.fold_in(jax.random.fold_in(key, k), i)
                layer[f"w{i}"] = (jax.random.normal(kk, (a, b))
                                  / np.sqrt(a))
                layer[f"b{i}"] = jnp.zeros(b)
            # zero-init output head -> every flow starts at (m=0, s=0):
            # u <- sigmoid(2) * u, i.e. near-identity
            layer["w_out"] = jnp.zeros((widths[-1], 2 * self.dim))
            layer["b_out"] = jnp.zeros(2 * self.dim)
            flows.append(layer)
        return {
            "loc": loc,
            "log_scale": jnp.full(self.dim, math.log(self.init_scale)),
            "flows": flows,
        }

    def _conditioner(self, layer, u):
        h = u
        for i, mask in enumerate(self._masks):
            h = jnp.tanh(h @ (layer[f"w{i}"] * mask) + layer[f"b{i}"])
        out = h @ (layer["w_out"] * self._out_mask) + layer["b_out"]
        m, s = out[..., :self.dim], out[..., self.dim:]
        return m, s

    def _push(self, params, eps):
        """Base sample + flow stack.  eps (..., dim) -> (u, logq)."""
        u = params["loc"] + jnp.exp(params["log_scale"]) * eps
        logq = jnp.sum(-0.5 * eps * eps - 0.5 * _LOG_2PI
                       - params["log_scale"], -1)
        for k, layer in enumerate(params["flows"]):
            if k % 2 == 1:
                u = jnp.flip(u, axis=-1)
            m, s = self._conditioner(layer, u)
            g = jax.nn.sigmoid(s + 2.0)
            u = g * u + (1.0 - g) * m
            logq = logq - jnp.sum(jnp.log(g), -1)
            if k % 2 == 1:
                u = jnp.flip(u, axis=-1)
        return u, logq

    def sample_and_log_prob(self, params, key, sample_shape=(),
                            stop_gradient_q=False, ctx=None):
        # stop_gradient_q intentionally ignored (see module docstring)
        eps = jax.random.normal(key, tuple(sample_shape) + (self.dim,),
                                jnp.result_type(float))
        flat, logq = self._push(params, eps)
        return self.unravel(flat), logq

    # ------------------------------------------------------------------
    def stats(self, params, key=None, num_draws=4096):
        """Monte-Carlo unconstrained mean/std per site."""
        key = key if key is not None else jax.random.PRNGKey(0)
        eps = jax.random.normal(key, (int(num_draws), self.dim))
        flat, _ = self._push(params, eps)
        return (self.unravel(jnp.mean(flat, 0)),
                self.unravel(jnp.std(flat, 0)))
