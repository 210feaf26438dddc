#!/usr/bin/env python3
"""CLI dispatcher (reference ``run_task.py:11-22``):

    python run_task.py TrainKWClip_GeneralTransformer --config <yaml> --train
"""
import argparse
import os
import sys

# Honor an explicit JAX_PLATFORMS before any backend initializes: ambient
# TPU plugins (e.g. the experimental axon tunnel) can clobber the env var
# during `import jax`, silently routing a CPU-requested run onto the device.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# Multi-host (pod-scale) entry: SPEECHCLIP_MULTIHOST=auto on a TPU pod
# slice, or SPEECHCLIP_COORDINATOR/NUM_PROCESSES/PROCESS_ID for explicit
# bring-up. Must run before any backend use; no-op on a single host.
from speechclip_plus_tpu.parallel import maybe_initialize_distributed

maybe_initialize_distributed()

import speechclip_plus_tpu.tasks as tasks


def main():
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("task", type=str, help="task class name")
    args, _ = parser.parse_known_args()

    runner = getattr(tasks, args.task)()
    task_parser = argparse.ArgumentParser()
    task_parser.add_argument("task", type=str)
    runner.add_args(task_parser)
    runner.parse_args(task_parser)
    runner.run()


if __name__ == "__main__":
    sys.exit(main())
