"""Mesh/sharding substrate + cross-shard algorithms (SURVEY.md C11-C13, C15)."""

from .dp import dp_svi_run
from .mesh import AXES, P, make_mesh, put_replicated, put_sharded, replicate, shard_leading
from .resample import (
    effective_sample_size,
    normalize_log_weights,
    systematic_ancestors,
    systematic_resample,
    systematic_resample_shard_map,
)

__all__ = [
    "AXES", "P", "make_mesh", "shard_leading", "replicate", "put_sharded",
    "put_replicated", "systematic_ancestors", "systematic_resample",
    "systematic_resample_shard_map", "normalize_log_weights",
    "effective_sample_size", "dp_svi_run",
]
