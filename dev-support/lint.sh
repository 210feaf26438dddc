#!/bin/bash
# Lint check (reference dev-support/lint.sh runs isort+black): use whatever
# of isort/black/ruff is available; succeed with a notice otherwise.
set -e
cd "$(dirname "$0")/.."
ran=0
if command -v ruff >/dev/null 2>&1; then ruff check speechclip_plus_tpu tests && ran=1; fi
if command -v black >/dev/null 2>&1; then black --check speechclip_plus_tpu tests && ran=1; fi
if command -v isort >/dev/null 2>&1; then isort --check-only speechclip_plus_tpu tests && ran=1; fi
[ "$ran" = "1" ] || echo "no linters installed; skipping"
