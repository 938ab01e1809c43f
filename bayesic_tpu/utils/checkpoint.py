"""Minimal orbax-free checkpointer (SURVEY.md §5 checkpoint/resume).

Saves any pytree (params, optimizer state, PRNG key, step counters, NUTS
adaptation state) as a single ``.npz`` keyed by tree paths; restore requires
a structurally identical target pytree (the usual "init then restore"
pattern).  Multi-host rule: only process 0 writes; every host restores; an
all-host barrier (psum of a unit scalar) follows the write so no host races
ahead (SURVEY.md §5).
"""

from __future__ import annotations

import os
import tempfile

import jax
import numpy as np

__all__ = ["save", "restore", "save_multihost"]


def _path_str(path):
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save(path, tree):
    """Write ``tree`` to ``path`` (.npz). Atomic via temp-file rename."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {}
    for p, leaf in leaves:
        arrays[_path_str(p)] = np.asarray(leaf)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def restore(path, target):
    """Load ``path`` into the structure of ``target`` (shapes must match)."""
    with np.load(path) as data:
        paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(target)
        new_leaves = []
        for p, leaf in paths_leaves:
            key = _path_str(p)
            if key not in data:
                raise KeyError(
                    f"checkpoint {path} missing leaf {key!r}"
                )
            arr = data[key]
            if arr.shape != np.shape(leaf):
                raise ValueError(
                    f"leaf {key!r}: checkpoint shape {arr.shape} != "
                    f"target shape {np.shape(leaf)}"
                )
            new_leaves.append(
                jax.numpy.asarray(arr).astype(np.asarray(leaf).dtype)
            )
        return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_multihost(path, tree):
    """Process-0-only write with an all-host barrier after (SURVEY.md §5)."""
    if jax.process_index() == 0:
        save(path, tree)
    if jax.process_count() > 1:
        # barrier: a tiny collective every host must reach
        import jax.numpy as jnp

        jax.block_until_ready(
            jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
                jnp.ones((jax.local_device_count(),))
            )
        )
    return path
