"""Mesh setup and sharding helpers.

The reference scales with single-node Lightning DP (replicate / scatter /
gather, `avssl/model/kwClip.py:145-193`, `config ... strategy: dp`). The
TPU-native equivalent is a 1-D `jax.sharding.Mesh` over the batch ("data")
axis: inputs are sharded on their leading axis, parameters are replicated,
and the whole train step is one jitted global-view program — XLA inserts the
all-gather that lets the contrastive loss see the global batch (in-batch
negatives spanning all chips, over ICI) and the psum for gradients.

Multi-slice / multi-host: the same program runs unchanged; `jax.devices()`
spans all processes and collectives ride ICI within a slice and DCN across.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch"]

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = DATA_AXIS) -> dict:
    """Device-put a host batch with the leading axis sharded over the mesh."""
    sharding = batch_sharding(mesh, axis_name)

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)
