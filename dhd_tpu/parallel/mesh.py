"""Device mesh + sharding helpers (single-host and multi-host).

The reference's only parallelism is NCCL data parallelism via
torch.distributed.launch + MMDistributedDataParallel, scaled to multiple
nodes through NNODES/MASTER_ADDR env vars (tools/dist_train.sh:5-20) or
slurm (tools/slurm_train.sh:16-25).  The TPU-native equivalent:

* one *process per host*, connected by ``jax.distributed.initialize``
  (the torch.distributed.launch analogue — on Cloud TPU pods the
  coordinator is discovered automatically);
* a ``jax.sharding.Mesh`` with a ``data`` axis over all global devices,
  batches sharded over it, parameters replicated;
* under jit, XLA GSPMD inserts the gradient all-reduce (DDP) and makes
  every BatchNorm a SyncBN (batch-stat reductions become global means) —
  riding ICI within a slice and DCN across slices automatically.

Multi-host data loading: each process loads only its shard of the global
batch; :func:`shard_batch` assembles the global array from per-process
local data.

Pod-slice launch recipe (the dist_train.sh equivalent)::

    # on every host of the slice (or via gcloud ... --worker=all):
    python -m dhd_tpu.cli.train --preset dhd_s --ann-file ... \
        --batch-size <global batch>
    # TPU pods need no env vars: jax.distributed.initialize() discovers
    # the coordinator.  On other platforms set
    # JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed() -> bool:
    """Connect this process to a multi-host JAX job if one is configured.

    Returns True when running multi-process.  Safe to call in single-host
    runs (no-op).  Triggers on either the standard JAX env vars or TPU pod
    metadata; never raises for plain single-host use.
    """
    if jax.process_count() > 1:
        return True                      # already initialized
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    n = os.environ.get("JAX_NUM_PROCESSES")
    if addr and n and int(n) > 1:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(n),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))
        return True
    if os.environ.get("DHD_AUTO_DISTRIBUTED"):
        # TPU pod: everything is discovered from the metadata server
        jax.distributed.initialize()
        return jax.process_count() > 1
    return False


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence[Any]] = None) -> Mesh:
    """1-D data-parallel mesh.

    Uses all *global* devices by default (multi-host aware).  Device order
    comes from ``mesh_utils.create_device_mesh`` when the full device set
    is used, which keeps ICI neighbours adjacent so the GSPMD all-reduce
    rides ICI within a slice and crosses DCN only between slices.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None and num_devices < len(devices):
        devices = devices[:num_devices]
    else:
        try:
            from jax.experimental import mesh_utils
            devices = mesh_utils.create_device_mesh(
                (len(devices),), devices=devices).reshape(-1)
        except Exception:
            pass                                  # fall back to given order
    return Mesh(np.asarray(devices).reshape(-1), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def process_batch_slice(global_batch: int) -> slice:
    """The [start, stop) of the global batch this process must load.

    Single-host: the whole batch.  Multi-host: an equal contiguous shard
    (the DistributedSampler equivalent).
    """
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a batch with batch-axis sharding.

    Single-process: a plain sharded device_put.  Multi-process: ``batch``
    holds only this process's rows (see :func:`process_batch_slice`) and
    the global array is assembled from per-process local data.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
                for k, v in batch.items()}
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated_sharding(mesh))
