"""Systematic resampling — single-device and cross-shard.

Blueprint: SURVEY.md C13b, the hardest collective choreography (§7 hard-part
1): "a globally-ordered, low-variance resampler needs a cross-host prefix sum
and data-dependent cross-shard particle routing inside a jit".

Two interchangeable implementations (tested equal, SURVEY.md §4.5):

* :func:`systematic_ancestors` + gather under plain ``jit`` with sharded
  arrays — the idiomatic TPU path: XLA's SPMD partitioner turns the global
  cumsum/searchsorted/gather into the needed collectives automatically.
* :func:`systematic_resample_shard_map` — the explicit choreography from
  SURVEY.md §3.3: global weight normalization (psum), distributed prefix sum
  (local cumsum + all_gather of shard totals + offset), shard-local stratified
  positions, and payload routing via an all_gather of particle shards.

Both use ONE shared uniform u0 (from a key that must be identical on every
shard) so the sharded result is bit-identical to the single-device result —
the SURVEY.md §4.5 golden rule.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

__all__ = [
    "normalize_log_weights", "effective_sample_size",
    "systematic_ancestors", "systematic_resample",
    "systematic_resample_shard_map",
]


def normalize_log_weights(log_weights):
    return log_weights - logsumexp(log_weights)


def effective_sample_size(log_weights):
    """ESS = (sum w)^2 / sum w^2 for unnormalized log weights."""
    lw = normalize_log_weights(log_weights)
    return jnp.exp(-logsumexp(2.0 * lw))


def systematic_ancestors(key, log_weights, num_out=None):
    """Global systematic resampling: ancestor indices of shape (num_out,).

    Positions u_j = (j + u0)/N with one shared uniform u0; ancestor_j is the
    index i with C_{i-1} <= u_j < C_i (C = normalized weight cumsum).
    """
    n = log_weights.shape[0]
    num_out = n if num_out is None else num_out
    w = jnp.exp(normalize_log_weights(log_weights))
    cum = jnp.cumsum(w)
    cum = cum / cum[-1]                      # exact 1.0 endpoint
    u0 = jax.random.uniform(key)
    pos = (jnp.arange(num_out) + u0) / num_out
    return jnp.clip(jnp.searchsorted(cum, pos, side="right"), 0, n - 1)


def systematic_resample(key, log_weights, particles, num_out=None):
    """Resample a particle pytree; works on sharded arrays under jit (XLA
    inserts the cross-shard gather)."""
    idx = systematic_ancestors(key, log_weights, num_out)
    return jax.tree_util.tree_map(lambda x: jnp.take(x, idx, axis=0),
                                  particles), idx


def systematic_resample_shard_map(axis_name):
    """Explicit SPMD resampler for use inside ``shard_map``.

    Returns ``fn(key, local_log_weights, local_particles) ->
    (local_particles_out, local_ancestors_global_idx)``.

    ``key`` must be identical across shards (it seeds the single shared
    stratified offset u0).
    """

    def fn(key, lw_local, particles_local):
        n_local = lw_local.shape[0]
        p = jax.lax.axis_size(axis_name)
        me = jax.lax.axis_index(axis_name)
        n_global = n_local * p

        # -- global normalization (collective #1: max + sum) --------------
        gmax = jax.lax.pmax(jnp.max(lw_local), axis_name)
        w_local = jnp.exp(lw_local - gmax)
        shard_sum = jnp.sum(w_local)
        total = jax.lax.psum(shard_sum, axis_name)
        w_local = w_local / total

        # -- distributed prefix sum (collective #2: all_gather of P sums) --
        shard_sums = jax.lax.all_gather(shard_sum / total, axis_name)  # (P,)
        offset = jnp.sum(jnp.where(jnp.arange(p) < me, shard_sums, 0.0))
        local_cum = offset + jnp.cumsum(w_local)       # global cumsum slice

        # -- shared stratified positions for MY output slots ---------------
        u0 = jax.random.uniform(key)
        out_start = me * n_local
        pos = (out_start + jnp.arange(n_local) + u0) / n_global

        # -- route payloads: gather the full particle array (collective #3)
        # and index it with globally-consistent ancestors.  The ancestor for
        # an output slot may live on any shard, so the payload movement is a
        # gather-by-global-index; all_gather is XLA's dense recast of the
        # ragged all_to_all (SURVEY.md §7 hard-part 1).
        cum_global = jax.lax.all_gather(local_cum, axis_name).reshape(-1)
        anc = jnp.clip(
            jnp.searchsorted(cum_global, pos, side="right"), 0, n_global - 1
        )
        gathered = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, axis_name).reshape(
                (n_global,) + x.shape[1:]
            ),
            particles_local,
        )
        out = jax.tree_util.tree_map(
            lambda x: jnp.take(x, anc, axis=0), gathered
        )
        return out, anc

    return fn
