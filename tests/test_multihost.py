"""Process-spanning DP: 2 OS processes x 4 virtual CPU devices join one
global mesh via `jax.distributed`, run the tiny flagship-shaped train step,
and the loss must match the single-process 8-device mesh — backing the
pod-scale all-gather claim (BASELINE.json config #5, SURVEY §5) with a real
multi-process test instead of a single-process simulation."""
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_two_process_dp_matches_single_process():
    script = os.path.join(REPO, "scripts", "dryrun_multihost.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the script sets its own per-subprocess
    env.pop("SPEECHCLIP_COORDINATOR", None)
    out = subprocess.run(
        [sys.executable, script], capture_output=True, text=True,
        timeout=1200, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["ok"] is True
    assert rec["processes"] == 2
    assert len(rec["multi_process_losses"]) == 2
