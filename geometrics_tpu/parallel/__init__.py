"""SPMD mesh / sharding layer (replaces: nothing — reference is single-device,
SURVEY.md §2.3; this is the TPU-native scaling story)."""

from .sharding import (
    data_sharding,
    make_mesh,
    make_mesh_for_batch,
    replicate_tree,
    replicated,
    shard_batch,
    shard_points_axis,
)

__all__ = [
    "data_sharding",
    "make_mesh",
    "make_mesh_for_batch",
    "replicate_tree",
    "replicated",
    "shard_batch",
    "shard_points_axis",
]
