"""Test harness: force an 8-device virtual CPU mesh before jax initializes,
so multi-chip sharding (all-gather contrastive loss, pjit DP) is exercised
without TPU hardware."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# force CPU: the ambient environment may preset JAX_PLATFORMS=axon (a remote
# single-TPU tunnel) which cannot host the 8-device mesh and serializes
# concurrent test runs
os.environ["JAX_PLATFORMS"] = "cpu"
# keep tests deterministic and quiet
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
# no persistent XLA compilation cache under pytest: concurrent test
# processes writing one cache dir can truncate entries, and a corrupt
# entry SEGFAULTS jax's deserializer (observed in CI-style full-suite
# runs) — an uncatchable failure mode for a pure optimization
os.environ.setdefault("SPEECHCLIP_NO_COMPILE_CACHE", "1")

import jax  # noqa: E402

# the ambient axon TPU plugin clobbers JAX_PLATFORMS during `import jax`;
# re-force the CPU platform through the config API (must run before any
# backend is initialized)
jax.config.update("jax_platforms", "cpu")

# golden tests compare against torch f32; use full-precision matmuls
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_compile_state():
    """Clear jit/compilation caches between test modules.

    A full single-process slow-tier run (~90 tests, hundreds of compiled
    executables) segfaults inside XLA-CPU's `backend_compile_and_load`
    (LLVM codegen) at the heaviest late module — 3/3 reproductions at
    test_task_cli's full-base model build, each passing in isolation with
    >100 GB RAM free. Bounding the accumulated in-process compiler state
    per module avoids the crash; cross-module executable reuse is ~nil, so
    the only cost is per-module recompiles of shared helpers."""
    yield
    jax.clear_caches()
