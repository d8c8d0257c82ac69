"""Device mesh + sharding helpers.

The reference's parallelism is data-parallel only (torch DataParallel /
DDP-over-NCCL via detectron2 launch; SURVEY.md section 2.2). The TPU-native
equivalent: a 1-D jax.sharding.Mesh over all chips with the batch dimension
sharded on axis 'dp'. Gradients and the criterion's num_masks normalizer
(torch.distributed.all_reduce in criterion.py:229-231) are reduced by XLA's
automatic collectives when the loss is computed under jit with sharded inputs -
no hand-written psum required.

The mesh is built once per process; multi-host setups extend the same mesh over
jax.distributed-initialized device sets.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "dp") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dimension."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis_name: str = "dp"):
    """Place a pytree of host arrays with the batch dim sharded over the mesh."""
    s = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
