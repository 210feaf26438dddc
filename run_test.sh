#!/bin/bash
# Test runner (reference run_test.sh shape): hermetic suite on a virtual
# 8-device CPU mesh.
set -e
python -m pytest tests/ -q "$@"
