"""Data parallelism over a jax.sharding device mesh.

The reference's only parallelism is DDP over ray batches with NCCL all-reduce
(SURVEY §2.4; reference train.py:283-285). The TPU-native equivalent: a 1-D
``data`` mesh over ICI; ray batches are sharded on the batch axis, model
parameters and occupancy buffers are replicated, and XLA's GSPMD partitioner
inserts the gradient all-reduce automatically when the jitted train step
computes a mean over the sharded batch — no NCCL, no DDP wrapper, no
hand-written collectives.

Multi-host (DCN) runs use the same mesh after ``jax.distributed.initialize``;
nothing else changes.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None) -> Optional[Mesh]:
    """Build a 1-D ('data',) mesh over the first ``num_devices`` devices.

    Returns None for single-device runs (plain jit, no sharding constraints).
    """
    devices = jax.devices()
    if num_devices is None:
        num_devices = len(devices)
    if num_devices <= 1:
        return None
    if num_devices > len(devices):
        raise ValueError(
            f"requested {num_devices} devices, have {len(devices)}")
    return Mesh(np.array(devices[:num_devices]), axis_names=("data",))


def shard_batch(batch: dict, mesh: Optional[Mesh]) -> dict:
    """Shard each batch array on its leading (ray) axis across ``data``."""
    if mesh is None:
        return batch
    sharding = NamedSharding(mesh, P("data"))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def constrain_batch(batch: dict, mesh: Optional[Mesh]) -> dict:
    """Constrain in-jit batch arrays to be sharded on their leading (ray)
    axis across ``data``. The GSPMD analogue of :func:`shard_batch` for
    batches materialized INSIDE a jitted program (the fused runner's
    on-device ray sampling): the constraint makes the partitioner slice the
    sampling gather and everything downstream per-device, and insert the
    gradient all-reduce where the loss mean crosses the sharded axis."""
    if mesh is None:
        return batch
    sharding = NamedSharding(mesh, P("data"))
    return {k: jax.lax.with_sharding_constraint(v, sharding)
            for k, v in batch.items()}


def replicate(tree, mesh: Optional[Mesh]):
    """Replicate a pytree (params / occupancy / poses) across the mesh."""
    if mesh is None:
        return tree
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
