#!/usr/bin/env bash
# Standard per-round verification for fpm-tpu (institutionalized — VERDICT
# r3 item 7). Run from the repo root after any change to traced code:
#
#   bash scripts/round_check.sh            # CPU suite + HW suite + reprime
#   bash scripts/round_check.sh --cpu-only
#
# Steps:
#  1. Full CPU test sweep on the 8-fake-device backend.
#  2. Compiled-on-hardware regression suite (FPM_TEST_PLATFORM=tpu) — the
#     Pallas-kernel parity claims on the real chip, NOT covered by step 1.
#  3. Compile-cache re-prime: the persistent .jax_cache keys hash MLIR
#     source locations, so ANY edit to a traced file (bench.py,
#     fpm_tpu/models/epry.py, fpm_tpu/ops/*.py, ...) silently invalidates
#     the cache and re-exposes the driver to cold-compile timeouts
#     (bench.py docstring). Re-prime = delete + one bench run + commit.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== [1/3] CPU test sweep =="
python -m pytest tests/ -q

if [[ "${1:-}" == "--cpu-only" ]]; then
  echo "skipping hardware steps (--cpu-only)"
  exit 0
fi

echo "== [2/3] compiled-on-TPU regression suite =="
FPM_TEST_PLATFORM=tpu timeout 1800 python -m pytest tests/test_tpu_hw.py -q

echo "== [3/3] re-prime the persistent compile cache =="
rm -rf .jax_cache
timeout 1200 python bench.py
echo "re-primed .jax_cache — remember: git add .jax_cache && commit"
