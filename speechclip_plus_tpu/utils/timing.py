"""Chained device timing for the profiling/benchmark scripts.

Two axon-tunnel hazards shape this helper:

1. every host sync costs a ~33 ms tunnel round trip, and
   `block_until_ready` alone does not drain the execution queue there —
   the sync must be a VALUE FETCH;
2. re-dispatching the SAME executable on the SAME input buffers is
   memoized by the runtime (re-running a jitted fn on unchanged args
   returns in ~0.03 ms regardless of its true cost), so a timing loop
   must make every call's inputs depend on the previous call's output.

So the contract is: `fn(eps, *args) -> scalar`, where the implementation
must fold the `eps` scalar into its computation (e.g. `x + eps`) and
scalar-reduce its result (e.g. `out.sum() * 1e-20`). `timed` chains eps
through the calls and fetches one value at the end. `bench.py` gets the
same effect for free by donating/threading the train state.
"""
from __future__ import annotations

import time

__all__ = ["sync_value", "timed"]


def sync_value(x) -> float:
    """Force execution with a value fetch (scalar-reduces non-scalars)."""
    import jax.numpy as jnp

    return float(jnp.asarray(x).astype(jnp.float32).sum())


def timed(fn, *args, iters: int = 3, chain: int = 5, label: str = "") -> float:
    """Min-of-`iters` mean seconds per call of `fn(eps, *args)`.

    `fn` takes a leading fp32 scalar it must fold into the computation and
    returns a scalar; each measurement dispatches `chain` data-dependent
    calls with ONE value-fetch sync at the end.
    """
    import jax.numpy as jnp

    if label:
        print(f"[{time.strftime('%H:%M:%S')}] compiling {label} ...",
              flush=True)
    out = sync_value(fn(jnp.float32(0.0), *args))  # compile + first sync
    times = []
    for _ in range(iters):
        acc = jnp.float32(out) * 1e-20
        t0 = time.perf_counter()
        for _ in range(chain):
            acc = fn(acc, *args)
        out = sync_value(acc)
        times.append((time.perf_counter() - t0) / chain)
    if label:
        print(f"[{time.strftime('%H:%M:%S')}] {label}: "
              f"{min(times) * 1e3:.2f} ms", flush=True)
    return min(times)
