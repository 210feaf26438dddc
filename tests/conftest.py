"""Test harness: force an 8-device virtual CPU mesh before jax initializes,
so multi-chip sharding (all-gather contrastive loss, pjit DP) is exercised
without TPU hardware."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# keep tests deterministic and quiet
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

# golden tests compare against torch f32; use full-precision matmuls
jax.config.update("jax_default_matmul_precision", "highest")
