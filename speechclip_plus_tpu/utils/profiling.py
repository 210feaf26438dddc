"""Profiling/tracing hooks (aux subsystem; the reference has none —
SURVEY §5 — so this is additive capability).

Thin wrappers over the JAX profiler: capture a trace viewable in
TensorBoard/Perfetto around any code region, annotate named spans inside
jitted code, and a step-timer for quick throughput numbers.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

__all__ = ["trace", "annotate", "StepTimer"]


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace: `with trace("/tmp/trace"): step(...)`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span that shows up in the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock steps/sec + pairs/sec with device sync."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self.reset()

    def reset(self) -> None:
        self._t0: Optional[float] = None
        self._steps = 0

    def tick(self, sync_on=None) -> None:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        if self._t0 is None:
            self._t0 = time.perf_counter()
        else:
            self._steps += 1

    @property
    def steps_per_sec(self) -> float:
        if not self._steps or self._t0 is None:
            return 0.0
        return self._steps / (time.perf_counter() - self._t0)

    @property
    def pairs_per_sec(self) -> float:
        return self.steps_per_sec * self.batch_size
