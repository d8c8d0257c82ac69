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

Parallelism menu for this model family (and why):
- dp (batch): training gradients + serving throughput (`jit_sharded`).
- sp (image height): single-image serving latency (`jit_sharded_sp`) - GSPMD
  conv halo exchanges + psums; no reference equivalent. dp x sp composes on a
  2-D mesh (tested).
- tp/pp/ep: deliberately not built. The largest model here is ~45M params
  (ResNet50 + decoder) - it fits in a fraction of one chip's HBM, so tensor/
  pipeline sharding would only add collective latency, and there are no
  experts to route. If a future backbone outgrows HBM, the decoder's
  fixed-max-softmax attention is psum-friendly (sharding K needs a single
  (num, den) psum, no cross-device running max).
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


def spatial_sharding(mesh: Mesh, axis_name: str = "sp") -> NamedSharding:
    """Shard the image HEIGHT dimension of [B, H, W, C] inputs (sequence/
    spatial parallelism). Under jit, GSPMD partitions the convolutions with
    automatic halo exchanges and turns the decoder's key/value reductions into
    psums over the axis - multi-chip then improves single-image LATENCY, which
    data parallelism cannot (the reference has no equivalent; its
    DataParallel eval only scales batch throughput)."""
    return NamedSharding(mesh, P(None, axis_name))
