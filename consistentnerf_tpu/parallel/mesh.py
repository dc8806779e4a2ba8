"""Device mesh + sharding for SPMD data parallelism over rays.

Replaces the reference's `jax.pmap(..., axis_name='batch')` + explicit
`lax.pmean` pattern (`RegNeRF/train.py:246-253,326-346`) with the idiomatic
jit-over-Mesh design: batches are sharded along the ray axis with a
`NamedSharding`, parameters are replicated, and XLA inserts the gradient
all-reduce over ICI automatically. Multi-host runs initialize the JAX
distributed runtime and assemble global arrays from per-host shards.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed for multi-host (DCN) runs.

    No-op in single-process mode. The reference relied on host-id offsets
    and per-host batch slicing (`train.py:302,358-364`); with the jax
    distributed runtime, global arrays own that bookkeeping. Must run
    before first backend use (cli/common.resolve_config calls it from
    every entry point when the config carries multi-process fields).
    """
    if num_processes is not None and num_processes > 1:
        import os

        if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
            # Multi-process CPU runs (tests / local rehearsal) need the
            # gloo cross-process collective backend.
            try:
                jax.config.update(
                    "jax_cpu_collectives_implementation", "gloo"
                )
            except Exception:
                pass
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def create_mesh(
    mesh_shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A mesh over all (or the given) devices; default 1-D 'data' axis."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if mesh_shape is None:
        mesh_shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(mesh_shape), axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard leading (ray) dimension across the mesh axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a host batch pytree, ray axis sharded over the mesh.

    Leaves whose leading dim doesn't divide the mesh axis (scalar bounds,
    replicated reference-view images, poses) are replicated instead — in
    global-view jit this is a layout choice only, never a semantics one.

    Multi-host: every process generates the same (seeded) GLOBAL batch
    host-side, and each process materializes only the shards of its
    addressable devices via `jax.make_array_from_callback` — the
    TPU-native equivalent of the reference's per-host batch slicing
    (`RegNeRF/internal/datasets.py:487-488`). `local_batch_slice` gives
    the per-process ray count for pipelines sizing host memory.
    """
    sharded = batch_sharding(mesh, axis)
    replicated = replicated_sharding(mesh)
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names if a == axis]))
    multiprocess = jax.process_count() > 1

    def put(x):
        x = np.asarray(x) if not hasattr(x, "shape") else x
        ok = x.ndim >= 1 and x.shape[0] % max(n, 1) == 0 and x.shape[0] > 0
        sh = sharded if ok else replicated
        if multiprocess:
            return jax.make_array_from_callback(
                x.shape, sh, lambda idx, _x=x: _x[idx]
            )
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)


def local_batch_slice(global_batch_size: int) -> int:
    """Per-process batch size for multi-host input pipelines."""
    if global_batch_size % jax.process_count() != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{jax.process_count()} processes"
        )
    return global_batch_size // jax.process_count()
