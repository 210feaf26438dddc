"""Multi-host (multi-process) training entry.

The reference scales with single-node Lightning DP only
(`avssl/model/kwClip.py:145-193`); SURVEY §5 and BASELINE config #5 name
pod-scale, DCN-transparent data parallelism as the TPU-native target. JAX's
model: every process runs the SAME jitted program over a mesh built from
`jax.devices()` (which spans all processes after
`jax.distributed.initialize`); XLA routes collectives over ICI within a
slice and DCN across slices — the train step (`parallel/train_step.py`)
is unchanged.

What this module adds:
  - `maybe_initialize_distributed()`: idempotent env-driven
    `jax.distributed.initialize` wiring, called from `run_task.py` before
    any backend use. On a real TPU pod slice set
    `SPEECHCLIP_MULTIHOST=auto` (JAX autodetects coordinator/process ids
    from the TPU metadata); for explicit bring-up (CPU dryruns, GPU-style
    clusters) set SPEECHCLIP_COORDINATOR=host:port,
    SPEECHCLIP_NUM_PROCESSES, SPEECHCLIP_PROCESS_ID.
  - `make_global_batch()`: per-process batch assembly — each host passes
    its LOCAL rows and gets back one global jax.Array sharded over the
    mesh's data axis (`jax.make_array_from_process_local_data`); the
    single-process path falls back to a plain device_put so callers can
    use it unconditionally.

Verified by `scripts/dryrun_multihost.py` / `tests/test_multihost.py`:
two OS processes x 4 virtual CPU devices each run the flagship-shaped DP
step over the global 8-device mesh, and the loss matches the
single-process 8-device mesh bit-for-tolerance.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from .mesh import DATA_AXIS, batch_sharding

__all__ = ["maybe_initialize_distributed", "make_global_batch"]

_initialized = False


def maybe_initialize_distributed(env: Optional[dict] = None) -> bool:
    """Initialize `jax.distributed` from the environment (idempotent).

    Returns True if distributed mode was (already) initialized. Must run
    BEFORE any other jax API touches the backend.

    Env contract (first match wins):
      SPEECHCLIP_MULTIHOST=auto        -> jax.distributed.initialize()
          (TPU pod: coordinator + process ids come from platform metadata)
      SPEECHCLIP_COORDINATOR=host:port
      SPEECHCLIP_NUM_PROCESSES=N
      SPEECHCLIP_PROCESS_ID=i          -> explicit bring-up (CPU/GPU dryrun)
    """
    global _initialized
    if _initialized:
        return True
    e = os.environ if env is None else env
    mode = e.get("SPEECHCLIP_MULTIHOST", "").lower()
    coord = e.get("SPEECHCLIP_COORDINATOR")
    if mode == "auto":
        jax.distributed.initialize()
        _initialized = True
        return True
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(e["SPEECHCLIP_NUM_PROCESSES"]),
            process_id=int(e["SPEECHCLIP_PROCESS_ID"]),
        )
        _initialized = True
        return True
    return False


def make_global_batch(batch: dict, mesh, axis_name: str = DATA_AXIS) -> dict:
    """Assemble a global sharded batch from per-process local rows.

    Single-process: plain device_put with the batch axis sharded (identical
    to `mesh.shard_batch`). Multi-process: `batch` must hold each host's
    LOCAL rows (global_batch / process_count); the returned arrays are
    global jax.Arrays addressable only where their shards live — exactly
    what the global-view jitted step consumes.
    """
    sharding = batch_sharding(mesh, axis_name)
    nproc = jax.process_count()
    if nproc == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch
        )

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, batch)
