"""Solver layer: the EPRY phase-retrieval engine (reference L2, runFPM).

``epry`` holds the jitted single-device solver (sequential Gauss–Seidel parity
mode and batched synchronous mode); ``recover`` is the high-level
reconstruction API consumed by the CLI and benchmarks.
"""

from .epry import (  # noqa: F401
    EPRYOptions,
    ReconResult,
    init_state,
    led_step,
    reconstruct,
    reconstruct_channels,
    sweep_batched,
    sweep_sequential,
)
