"""Distributed execution: device meshes and sharding helpers."""

from consistentnerf_tpu.parallel.mesh import (
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    local_batch_slice,
    maybe_initialize_distributed,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "local_batch_slice",
    "maybe_initialize_distributed",
]
