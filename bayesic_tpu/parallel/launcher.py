"""Multi-host launch wiring + cross-host consistency guards.

Blueprint: SURVEY.md C15 — "jax.distributed.initialize wiring, per-host data
loading (host shard of the global batch), process-0-only logging/checkpoint
writes" — and §5 race-detection analogue (a): "cross-host desync detection:
periodic hash-psum of replicated pytrees with abort on mismatch".

There is no hand-rolled communication backend (SURVEY.md C11): process
bring-up is jax.distributed's GRPC coordinator; everything after that is
XLA-compiled collectives.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "initialize", "is_primary", "host_shard", "replicated_fingerprint",
    "check_replicated_sync", "DesyncError",
]


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               local_device_ids=None):
    """Bring up the multi-host runtime.  No-ops for single-process runs.
    Args default from the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) so launchers can stay declarative."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return False
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def is_primary():
    return jax.process_index() == 0


def host_shard(array, axis_size=None, axis_index=None):
    """This host's contiguous slice of a host-loaded global array
    (SURVEY.md C15: each host feeds only its shard of the global batch)."""
    axis_size = axis_size if axis_size is not None else jax.process_count()
    axis_index = (
        axis_index if axis_index is not None else jax.process_index()
    )
    n = array.shape[0]
    assert n % axis_size == 0, f"{n} rows not divisible by {axis_size} hosts"
    per = n // axis_size
    return array[axis_index * per:(axis_index + 1) * per]


class DesyncError(RuntimeError):
    pass


def replicated_fingerprint(tree):
    """Deterministic scalar fingerprint of a pytree (bitwise, order-fixed):
    identical across hosts iff the replicated state is identical."""
    leaves = jax.tree_util.tree_leaves(tree)
    acc = jnp.zeros((), jnp.uint32)
    for leaf in leaves:
        leaf = jnp.asarray(leaf)
        if jnp.issubdtype(leaf.dtype, jnp.integer):
            # ints (e.g. uint32 PRNG keys) must NOT round-trip through
            # f32 — the 24-bit mantissa would collapse nearby values and
            # hide a desync (r2 review finding)
            bits = leaf.ravel().astype(jnp.uint32)
        else:
            bits = jax.lax.bitcast_convert_type(
                leaf.astype(jnp.float32).ravel(), jnp.uint32
            )
        # order-dependent mix so permuted values change the fingerprint
        idx = jnp.arange(bits.shape[0], dtype=jnp.uint32)
        acc = acc + jnp.sum(bits * (idx * jnp.uint32(2654435761) + 1),
                            dtype=jnp.uint32)
    return acc


def check_replicated_sync(tree, axis_name=None):
    """Verify all hosts/devices hold identical replicated state
    (SURVEY.md §5 desync detection).  Outside pmap/shard_map: compares the
    fingerprint across processes via an all-gather; raises DesyncError on
    mismatch.  Inside a collective context pass ``axis_name`` and use the
    returned (min, max) fingerprints."""
    fp = replicated_fingerprint(tree)
    if axis_name is not None:
        lo = jax.lax.pmin(fp, axis_name)
        hi = jax.lax.pmax(fp, axis_name)
        return lo, hi
    if jax.process_count() == 1:
        return True
    from jax.experimental import multihost_utils

    # fetch the (replicated, hence addressable) scalar to host first —
    # gathering global arrays directly requires tiling
    all_fp = multihost_utils.process_allgather(np.asarray(jax.device_get(fp)))
    if not bool(np.all(np.asarray(all_fp) == np.asarray(all_fp)[0])):
        raise DesyncError(
            f"replicated state fingerprints diverged across hosts: "
            f"{np.asarray(all_fp).tolist()}"
        )
    return True
