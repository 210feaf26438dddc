"""Persistent XLA compilation cache.

Long training jobs and benchmarks recompile the same step graphs on every
process start; on a remote-tunneled TPU backend a cold compile of the full
hybrid+ step costs minutes. Enabling JAX's persistent compilation cache
turns every later start into a disk hit. Opt out with
SPEECHCLIP_NO_COMPILE_CACHE=1 or `trainer.compile_cache: false`.

(The torch reference has no equivalent — eager mode pays per-op dispatch
instead; this is part of the XLA-native cost model, see DESIGN.md.)
"""
from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

__all__ = ["enable_persistent_cache"]

DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                           "speechclip_plus_tpu", "xla")


def enable_persistent_cache(path: str | None = None) -> bool:
    """Point JAX at an on-disk compilation cache. Safe to call repeatedly;
    returns True if the cache is active."""
    if os.environ.get("SPEECHCLIP_NO_COMPILE_CACHE"):
        return False
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or DEFAULT_DIR
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # default threshold (1 s) skips tiny graphs; keep it but make sure
        # the big step graphs always persist
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception as e:  # an optimization, never a requirement
        logger.info("persistent compilation cache unavailable: %r", e)
        return False
