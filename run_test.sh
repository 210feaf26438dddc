#!/bin/bash
# Test runner (reference run_test.sh shape): hermetic suite on a virtual
# 8-device CPU mesh.
#
# Default = fast tier (pure ops, data, config, schedulers — seconds to a
# couple of minutes). The slow tier (torch-oracle tower parity, 5-branch
# model builds, subprocess CLI runs, DP mesh training) is minutes-per-file
# on one CPU; run it with --all or SLOW=1. CI runs both as separate jobs so
# the fast signal stays fast (SURVEY §4: the reference's CI was lint-only —
# decorative; a >10-min default suite recreates that failure mode).
set -e
if [[ "$1" == "--all" ]]; then
  shift
  python -m pytest tests/ -q "$@"
elif [[ -n "$SLOW" ]]; then
  python -m pytest tests/ -q "$@"
else
  python -m pytest tests/ -q -m "not slow" "$@"
fi
