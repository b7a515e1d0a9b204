"""Device mesh + sharding helpers.

The reference's only parallelism is NCCL data parallelism via
torch.distributed.launch + MMDistributedDataParallel (SURVEY.md §2.3).  The
TPU-native equivalent: a ``jax.sharding.Mesh`` with a ``data`` axis, batches
sharded over it, parameters replicated.  Under jit, XLA GSPMD then inserts
the gradient all-reduce (the DDP equivalent) and makes every BatchNorm a
SyncBN (batch-stat reductions become global means over ICI) automatically.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence[Any]] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put every array in the batch with batch-axis sharding."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated_sharding(mesh))
