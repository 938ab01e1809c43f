"""Data-parallel composition of the whole-run fused trainers (VERDICT r2
item 3; SURVEY.md §6 scaling, C12/C14).

The fused Pallas trainers (ops/fused_{linreg,hier,vae}.py) run an entire
training segment in ONE kernel launch — a per-step gradient psum would
mean leaving the kernel every step and re-paying exactly the launch/HBM
overhead the fusion removed.  Two TPU-native compositions instead:

1. **Distributed sufficient statistics** (linreg): the Gram matrix is
   additive over row shards, so DP = a one-time ``psum`` of local Grams
   (O(128^2) bytes on the wire, not O(N)) followed by BIT-IDENTICAL
   replicated training.  Exact — no estimator change at all.

2. **Segment-averaged local SGD** (hier, DLGM — any minibatch trainer):
   each device runs a K-step fused segment on its LOCAL shard with the
   likelihood scaled to the GLOBAL size (``n_total``), then params AND
   Adam moments are ``pmean``'d across the data axis, and the next
   segment starts from the average.  Each device's gradient is an
   unbiased estimate of the full ELBO gradient (uniform local batches x
   global scale over a randomly sharded dataset), so this is parallel
   SGD with periodic model averaging: same stationary point as the
   single-device trainer in the frequent-averaging limit, variance
   reduced by the device count between averaging points.

   Segment length is a bias/communication dial, and it BITES on
   hierarchical scale parameters: between averages each device drifts
   toward the posterior of ITS shard, and averaging location parameters
   of a correlated (funnel) posterior is not the same as averaging the
   posterior — measured on hier-logistic (8 shards, 4k steps): segments
   of <=10 steps reproduce the single-device optimum (log-tau within
   0.07), segments of >=20 steps bias log-tau by ~+0.8 while mu/beta
   stay correct.  Keep segments short for hierarchical models (the
   collective is one (1,128)-lane pmean — at 10-step segments it costs
   ~10% of the fused step rate); plain MLP/VAE objectives tolerate much
   longer segments (standard local-SGD behavior).  Tested against the
   single-device trainers in tests/test_dp_fused.py.

Both compositions are choreography-only: shard_map + one collective per
segment, everything inside jit.
"""

from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

__all__ = ["dp_gram", "segment_averaged_train"]

# Measured-safe segment length for models with hierarchical scale sites
# (hier-logistic, 8 shards, 4k steps: segments <=10 reproduce the
# single-device optimum with log-tau within 0.07; segments >=20 bias
# log-tau by ~+0.8).  Enforced by segment_averaged_train below.
MAX_HIER_SEGMENT_STEPS = 10


def dp_gram(x_packed_sharded, mesh, axis="data"):
    """Distributed Gram reduction: psum of per-shard P^T P over ``axis``.
    Exact up to f32 summation order (per-shard partial sums then an
    8-term tree reduction — tighter than one long f32 chain)."""

    def local(xs):
        g = jax.lax.dot_general(
            xs, xs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jax.lax.psum(g, axis)

    fn = jax.shard_map(local, mesh=mesh, in_specs=(P(axis),),
                       out_specs=P())
    return jax.jit(fn)(x_packed_sharded)


def segment_averaged_train(local_train, state, sharded_data, mesh, *,
                           segments, steps_per_segment, seed=0,
                           axis="data", hierarchical_scales=None,
                           allow_biased_segments=False):
    """Run ``segments`` x ``steps_per_segment`` fused steps under
    segment-averaged DP.

    ``local_train(data_local, state, seed, t0) -> (state, losses)`` runs
    one fused segment on the local shard; it must scale its likelihood
    with the GLOBAL dataset size (pass ``n_total`` to the fused trainer)
    and accept a traced int32 ``seed``/``t0``.  ``state`` is the full
    pytree to average (params + optimizer moments).  Returns
    (state, losses) with losses the device-mean trace, concatenated over
    segments.

    Bias guard (VERDICT r3 item 6): long segments on models with
    HIERARCHICAL SCALE sites (funnel posteriors — a global log-scale over
    group effects) silently bias the scale upward: between averages each
    device drifts toward its shard's posterior, and averaging location
    parameters of a correlated posterior is not averaging the posterior
    (measured: +0.8 on hier-logistic log-tau at segments >= 20).  Declare
    the model via ``hierarchical_scales``:

    * ``True``  — segments longer than ``MAX_HIER_SEGMENT_STEPS`` raise,
      unless ``allow_biased_segments=True`` (you accept the bias).
    * ``False`` — no cap (plain MLP/VAE objectives tolerate long
      segments; standard local-SGD behavior).
    * ``None``  (default) — unknown model: a long segment emits a
      ``UserWarning`` telling you to declare.
    """
    n_dev = mesh.shape[axis]
    segments = int(segments)
    sps = int(steps_per_segment)
    if sps > MAX_HIER_SEGMENT_STEPS and not allow_biased_segments:
        if hierarchical_scales:
            raise ValueError(
                f"steps_per_segment={sps} exceeds the measured-safe "
                f"{MAX_HIER_SEGMENT_STEPS} for models with hierarchical "
                "scale sites: segment-averaged DP biases the scale "
                "posterior upward (~+0.8 in log-tau at >=20-step segments "
                "on hier-logistic).  Shorten the segments, or pass "
                "allow_biased_segments=True to accept the bias.")
        if hierarchical_scales is None:
            warnings.warn(
                f"steps_per_segment={sps} > {MAX_HIER_SEGMENT_STEPS}: if "
                "this model has hierarchical scale sites the averaged "
                "posterior scale will be biased (see dp_fused docstring). "
                "Declare hierarchical_scales=True/False to silence this.",
                UserWarning, stacklevel=2)

    def run(state, data_local):
        idx = jax.lax.axis_index(axis)
        # the replicated state becomes device-varying inside the local
        # segments (per-device PRNG streams); mark it so scan's carry
        # typing is consistent (shard_map varying-manual-axes rule)
        state = jax.tree_util.tree_map(
            lambda x: jax.lax.pcast(x, (axis,), to="varying"), state)

        def seg(state, s):
            # distinct per-(device, segment) streams
            dev_seed = (jnp.int32(seed) + s + 1) * jnp.int32(n_dev) + idx
            state, losses = local_train(data_local, state, dev_seed,
                                        s * sps)
            # pmean returns device-invariant values; re-mark them varying
            # to keep the scan carry type stable
            state = jax.tree_util.tree_map(
                lambda x: jax.lax.pcast(jax.lax.pmean(x, axis), (axis,),
                                        to="varying"), state)
            return state, jax.lax.pmean(losses, axis)

        state, losses = jax.lax.scan(seg, state,
                                     jnp.arange(segments, dtype=jnp.int32))
        # the values are replicated after the last pmean, but the scan
        # carry is typed varying — one closing pmean certifies replication
        # for out_specs=P() (a no-op numerically)
        state = jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(x, axis), state)
        return state, losses

    fn = jax.jit(jax.shard_map(
        run, mesh=mesh,
        in_specs=(P(), jax.tree_util.tree_map(lambda _: P(axis),
                                              sharded_data)),
        out_specs=(P(), P())))
    state, losses = fn(state, sharded_data)
    return state, losses.reshape(-1)


def replicated_train(local_train, state, data, mesh, *, seed=0,
                     axis="data"):
    """Sanity harness: run ``local_train`` with IDENTICAL data and seed on
    every device and pmean — must be bit-identical to a single-device
    run (validates the choreography; used in tests)."""

    def seg(state, data_rep, seed_t0):
        state, losses = local_train(data_rep, state, seed_t0[0],
                                    seed_t0[1])
        state = jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(x, axis), state)
        return state, losses

    fn = jax.jit(jax.shard_map(
        seg, mesh=mesh,
        in_specs=(P(), jax.tree_util.tree_map(lambda _: P(), data), P()),
        out_specs=(P(), P())))
    return fn(state, data, jnp.asarray([seed, 0], jnp.int32))
