"""Device-mesh data parallelism via jax.sharding + jit.

TPU-native replacement for the reference's single-node DDP/NCCL path
(ref opencood/tools/train_ddp.py:45-110, multi_gpu_utils.py:16-38): instead
of process-group all-reduce, the batch is sharded over the ``data`` axis of
a Mesh and parameters are replicated; XLA inserts the gradient psum over
ICI automatically when the jitted train step consumes sharded inputs.

Multi-host (DCN) extends the same mesh via jax.distributed.initialize —
no framework changes needed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis,))


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Place every batch leaf with its leading dim sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
