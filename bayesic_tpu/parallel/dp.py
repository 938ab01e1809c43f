"""Explicit data-parallel SVI: shard_map choreography with hand-placed psum.

Blueprint: SURVEY.md C12 — "mini-batch sharded over the ``data`` axis;
per-shard ELBO grad; psum mean; replicated guide params & opt state".  The
*idiomatic* DP path is the one in ``infer.svi.SVI.run`` (shard the data
pytree, jit, let XLA's auto-SPMD partitioner insert the psum); this module
is the explicit fallback for when auto partitioning makes a wrong choice
(VERDICT r1 item 9): every collective is hand-placed, so the communication
pattern is exactly one gradient ``psum`` per step by construction.

Decomposition (keys and guide draws identical on every shard, so the
replicated update is deterministic):

    elbo        = E_q[ log_lik(data) + log_prior - log q ]
    local elbo  = E_q[ log_lik(local shard) + (log_prior - log q)/S ]
    elbo        = psum(local elbo, "data")        # S = data-axis size

so ``grad(elbo) = psum(grad(local elbo))`` — per-shard backward passes touch
only the local rows.

Scope: the model's likelihood must be a plain sum over the leading
(sharded) data axis, evaluated via ``model_args``; guides whose sample
depends on the data (amortized ``NeuralGuide``) need the auto-SPMD path
instead.  Subsampled plates are not re-subsampled here — feed minibatches
through ``args`` per call if wanted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from ..infer.svi.svi import SVIResult, SVIState

__all__ = ["dp_svi_run"]


def dp_svi_run(svi, mesh, key, sharded_args, num_steps, axis="data",
               state=None, stl=True):
    """Run ``num_steps`` DP-SVI steps under an explicit ``shard_map``.

    ``sharded_args`` is the model_args tuple with every leaf's leading dim
    shardable over ``axis`` (global leading size divisible by the axis
    size).  Matches ``SVI.run(key, n, model_args=...)`` bit-for-bit modulo
    reduction order (tested in tests/test_sharding.py).
    """
    n_shards = mesh.shape[axis]
    if getattr(svi, "iwae", False) or getattr(svi, "dreg", False):
        raise ValueError(
            "dp_svi_run implements the plain (stl) ELBO only; an SVI "
            "configured with iwae/dreg would silently train a different "
            "objective here — use the auto-SPMD path instead"
        )
    if state is None:
        state = svi.init(key)

    parts = svi.logdensity.parts
    guide = svi.guide
    num_particles = svi.num_particles

    def local_loss(params, key_q, local_args):
        gp, mp = svi._split_params(params)
        u, logq = guide.sample_and_log_prob(
            gp, key_q, (num_particles,), stop_gradient_q=stl,
            ctx={"subsample": None, "model_args": local_args},
        )

        def one(ui):
            lp, ll = parts(ui, model_args=local_args, params=mp)
            return ll + lp / n_shards

        contrib = jax.vmap(one)(u)
        return -jnp.mean(contrib - logq / n_shards)

    def step(st: SVIState, local_args):
        # same key discipline as SVI.step (key_b reserved for subsampling)
        key_next, key_q, _key_b = jax.random.split(st.key, 3)
        loss, grads = jax.value_and_grad(local_loss)(
            st.params, key_q, local_args
        )
        grads = jax.lax.psum(grads, axis)
        if svi.grad_transform is not None:
            grads = svi.grad_transform(grads)
        loss = jax.lax.psum(loss, axis)
        updates, opt_state = svi.optimizer.update(
            grads, st.opt_state, st.params
        )
        params = optax.apply_updates(st.params, updates)
        return SVIState(params, opt_state, key_next, st.step + 1), loss

    def scan_fn(st, local_args):
        def body(c, _):
            return step(c, local_args)

        return jax.lax.scan(body, st, None, length=num_steps)

    fn = jax.shard_map(
        scan_fn, mesh=mesh,
        in_specs=(P(), jax.tree_util.tree_map(lambda _: P(axis),
                                              sharded_args)),
        out_specs=(P(), P()),
    )
    state, losses = jax.jit(fn)(state, sharded_args)
    return SVIResult(state.params, losses, state)
