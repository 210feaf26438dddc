"""Chained device timing for the profiling/benchmark scripts.

On the remote axon TPU backend every host sync costs a ~33 ms tunnel round
trip, and `block_until_ready` alone does not drain the execution queue
there — the sync must be a VALUE FETCH. So: dispatch `chain` async calls,
fetch one scalar at the end, divide. `bench.py` uses the same discipline
inline on the train step.
"""
from __future__ import annotations

import time

__all__ = ["sync_value", "timed"]


def sync_value(x) -> float:
    """Force execution with a value fetch (scalar-reduces non-scalars)."""
    import jax.numpy as jnp

    return float(jnp.asarray(x).astype(jnp.float32).sum())


def timed(fn, *args, iters: int = 5, chain: int = 10, label: str = "") -> float:
    """Min-of-`iters` mean seconds per call of `fn(*args)`; each
    measurement dispatches `chain` calls with ONE value-fetch sync."""
    if label:
        print(f"[{time.strftime('%H:%M:%S')}] compiling {label} ...",
              flush=True)
    sync_value(fn(*args))  # compile + first sync
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(chain):
            out = fn(*args)
        sync_value(out)
        times.append((time.perf_counter() - t0) / chain)
    if label:
        print(f"[{time.strftime('%H:%M:%S')}] {label}: "
              f"{min(times) * 1e3:.2f} ms", flush=True)
    return min(times)
