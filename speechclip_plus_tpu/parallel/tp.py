"""Tensor parallelism over a 2-D ("data", "model") mesh.

The reference scales with data parallelism only (Lightning DP, 2-4 GPUs —
`avssl/model/kwClip.py:145-193`, SURVEY §2.16); DP is all that recall parity
requires. This module is the TPU-native capability *beyond* that: Megatron-
style tensor parallelism expressed purely as sharding annotations on the
parameter tree — no model changes, no hand-written collectives. XLA's SPMD
partitioner inserts the all-reduces, and the result is semantics-preserving
by construction (tests pin loss/update parity against the single-device
step).

Layout (classic column/row pairing so each transformer block needs one
all-reduce per matmul pair):

- HuBERT encoder layers (separate q/k/v projections): q/k/v and fc1 are
  column-parallel (output dim sharded — per-shard attention heads), out_proj
  and fc2 row-parallel (contraction dim sharded).
- CLIP blocks: the MLP (c_fc/c_proj) is column/row-parallel. The attention
  packs QKV into one (D, 3D) kernel whose q|k|v boundary does not align with
  a "model"-axis shard, so it stays replicated (sharding it would just make
  XLA reshard at the split) — the MLP is 2/3 of a CLIP block's FLOPs.
- Branch mini-transformers (`linear1`/`linear2`): column/row-parallel;
  their packed-QKV attention likewise stays replicated.
- CLIP token embedding (V, D): vocab-sharded — the keyword head's
  (B·T, D) @ (D, V) cosine-score matmul computes a V-shard per device and
  the VQ's softmax/argmax over the vocab axis becomes a cross-shard
  collective, all inserted by XLA.
- Everything else (norms, convs, embeddings, scalars): replicated.

A dimension that the "model" axis size does not divide falls back to
replicated rather than padded sharding.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import (
    DictKey,
    FlattenedIndexKey,
    GetAttrKey,
    SequenceKey,
    tree_flatten_with_path,
    tree_map_with_path,
)

from .mesh import DATA_AXIS

__all__ = [
    "MODEL_AXIS",
    "make_mesh_2d",
    "param_partition_spec",
    "train_state_shardings",
    "shard_train_state",
]

MODEL_AXIS = "model"

# column-parallel: shard the kernel's output dim (and the matching bias)
_COLUMN = {"q_proj", "k_proj", "v_proj", "fc1", "c_fc", "linear1"}
# row-parallel: shard the kernel's contraction dim; bias stays replicated
_ROW = {"fc2", "c_proj", "linear2", "out_proj"}
# packed-QKV attention modules: misaligned shard boundary -> replicate
# everything under them, including their out_proj
_PACKED_ATTN = {"attn", "multihead_attn_layer", "self_attn"}


def make_mesh_2d(
    tp_size: int, devices: Optional[Sequence] = None
) -> Mesh:
    """(data, model) mesh: `tp_size`-way tensor parallel, DP over the rest."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if tp_size <= 0 or n % tp_size:
        raise ValueError(f"tp_size {tp_size} must divide device count {n}")
    arr = np.asarray(devices).reshape(n // tp_size, tp_size)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _key_str(k) -> str:
    if isinstance(k, DictKey):
        return str(k.key)
    if isinstance(k, GetAttrKey):
        return k.name
    if isinstance(k, SequenceKey):
        return str(k.idx)
    if isinstance(k, FlattenedIndexKey):
        return str(k.key)
    return str(k)


def param_partition_spec(path, shape, tp_size: int) -> P:
    """PartitionSpec for one parameter leaf under `tp_size`-way TP."""
    keys = [_key_str(k) for k in path]
    if not keys or len(shape) == 0:
        return P()
    name = keys[-1]
    mod = keys[-2] if len(keys) >= 2 else ""
    if mod == "token_embedding" and name == "embedding":
        if shape[0] % tp_size == 0:
            return P(MODEL_AXIS, *([None] * (len(shape) - 1)))
        return P()
    if any(k in _PACKED_ATTN for k in keys):
        return P()
    if mod in _COLUMN and shape[-1] % tp_size == 0:
        if name in ("kernel", "bias"):
            return P(*([None] * (len(shape) - 1)), MODEL_AXIS)
    if (
        mod in _ROW
        and name == "kernel"
        and len(shape) >= 2
        and shape[-2] % tp_size == 0
    ):
        return P(*([None] * (len(shape) - 2)), MODEL_AXIS, None)
    return P()


def train_state_shardings(state: Any, mesh: Mesh) -> Any:
    """NamedSharding tree matching a TrainState under the 2-D mesh.

    Parameter leaves get `param_partition_spec`; optimizer-state leaves
    mirror their parameter's sharding (optax nests params-shaped trees —
    matched by path suffix + shape); everything else (step counters, BN
    batch_stats) is replicated.
    """
    tp = int(mesh.shape[MODEL_AXIS])
    flat, _ = tree_flatten_with_path(state.params)
    table = {}
    for path, leaf in flat:
        keys = tuple(_key_str(k) for k in path)
        table[keys] = (param_partition_spec(path, leaf.shape, tp), leaf.shape)

    repl = NamedSharding(mesh, P())

    def assign(path, leaf):
        keys = tuple(_key_str(k) for k in path)
        shape = getattr(leaf, "shape", None)
        for i in range(len(keys)):
            hit = table.get(keys[i:])
            if hit is not None:
                spec, pshape = hit
                if shape == pshape:
                    return NamedSharding(mesh, spec)
        return repl

    return tree_map_with_path(assign, state)


def shard_train_state(state: Any, mesh: Mesh) -> Any:
    """Device-put a TrainState onto the 2-D mesh with TP shardings."""
    return jax.device_put(state, train_state_shardings(state, mesh))
