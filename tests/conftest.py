"""Test harness config: force a deterministic 8-fake-device CPU backend.

Distributed paths are tested without a cluster, the JAX idiom from
SURVEY.md §4.4: ``--xla_force_host_platform_device_count=8`` fake devices on
CPU, with x64 enabled so CPU runs can be compared against the float64 NumPy
oracle at tight tolerances.

Note: this container's sitecustomize imports jax at interpreter startup (to
register the TPU tunnel plugin), so env vars set here are too late for
jax's import-time config reads — use ``jax.config.update`` instead, which
works any time before the backend is first used.
"""

import os

# FPM_TEST_PLATFORM=tpu leaves the real backend in place for the
# compiled-on-hardware regression tests (tests/test_tpu_hw.py); everything
# else runs on the deterministic fake-device CPU backend below.
_PLATFORM = os.environ.get("FPM_TEST_PLATFORM", "cpu")

flags = os.environ.get("XLA_FLAGS", "")
if _PLATFORM == "cpu" and "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

if _PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
