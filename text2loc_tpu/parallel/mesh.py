"""Device-mesh construction and sharding helpers.

One 1-D mesh axis (`dp`) covers the reference's entire scaling story: the
global contrastive batch and the retrieval gallery are both sharded over it
(SURVEY.md section 2.6). The axis rides ICI within a slice; DCN/multi-slice is
out of reference parity scope.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = -1, axis_name: str = "dp",
              devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D mesh over the first `num_devices` devices (-1 = all)."""
    if devices is None:
        devices = jax.devices()
    if num_devices > 0:
        assert num_devices <= len(devices), (num_devices, len(devices))
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Shard the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "dp"):
    """Device-put a pytree of [B, ...] arrays with B sharded over the mesh.

    B must divide evenly by the mesh size — the input pipeline pads the final
    batch (evaluation) or drops the remainder (training), mirroring static
    -shape requirements of the compiled step.
    """
    n = mesh.devices.size
    sh = batch_sharding(mesh, axis_name)

    def put(x):
        assert x.shape[0] % n == 0, (
            f"batch dim {x.shape[0]} not divisible by mesh size {n}"
        )
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)


def shard_batch_multihost(batch, mesh: Mesh, axis_name: str = "dp"):
    """Multi-host variant of shard_batch: each process supplies only its
    process-local slice of the global batch (shape B_global/num_processes on
    axis 0) and the runtime assembles the global sharded array. Single-process
    meshes degrade to plain shard_batch semantics.

    The reference has no multi-process input path at all (its DataLoader is
    one process feeding one GPU, SURVEY.md section 1); this is the
    multi-host-ready pipeline hook (SURVEY.md section 7.2 item 7).
    """
    sh = batch_sharding(mesh, axis_name)

    def put(x):
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree_util.tree_map(put, batch)
