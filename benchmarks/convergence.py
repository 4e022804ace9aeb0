"""Batched (Jacobi) sweep convergence qualification at realistic LED counts.

The batched sweep is the shardable mode (SURVEY.md N1), deviating from the
reference's strictly sequential Gauss–Seidel semantics (fpmMain.cpp:348).
Round-1 tests only exercised it at 21 LEDs; this study runs the mono-optics
dome problems at the reference's realistic LED counts (~156 / 193 / ~508,
cf. the profiled run's 156 LEDs in BASELINE.md) with an aberrated
ground-truth pupil, and tracks per-sweep amplitude RMSE vs ground truth for

  * sequential (parity mode, the yardstick)
  * whole-sweep Jacobi (``chunk_size=0``) at pupil_step_scale ∈ {1.0, 0.5}
    — the round-1 formulation, shown unstable at these LED counts
  * chunked Gauss–Seidel-over-Jacobi (``models.epry.sweep_batched``):
    contiguous chunks at the measured stability edge (12) and beyond (24),
    and the recommended strided chunks (32, 64)

so the recommended chunking is measured, not asserted. Runs on CPU (float
math; no TPU needed). Results → JSON for SCALING.md.

Usage: python benchmarks/convergence.py [-o results.json] [--sweeps 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

# (label, max_illumination_NA): the dome table filtered at these NAs gives
# the reference-scale LED counts.
PROBLEMS = [
    ("dome-156", 0.40),
    ("dome-193", 0.45),
    ("dome-508", 0.7604),   # mono default (fpmMain.cpp:528) — full dome
]

# (label, solver overrides) for the batched variants
VARIANTS = [
    ("jacobi ps=1.0", dict(chunk_size=0, pupil_step_scale=1.0)),
    ("jacobi ps=0.5", dict(chunk_size=0, pupil_step_scale=0.5)),
    ("chunk=12 contiguous", dict(chunk_size=12, chunk_assign="contiguous")),
    ("chunk=24 contiguous", dict(chunk_size=24, chunk_assign="contiguous")),
    ("chunk=32 strided", dict(chunk_size=32, chunk_assign="strided")),
    ("chunk=64 strided", dict(chunk_size=64, chunk_assign="strided")),
]


def make_problem(max_na: float, seed: int = 0):
    from fpm_tpu.config import FPMConfig
    from fpm_tpu.data.simulate import make_test_object, simulate_images
    from fpm_tpu.geometry import compute_geometry, pupil_radius, pupil_support

    cfg = FPMConfig(max_illumination_na=max_na, iterations=1)
    geom = compute_geometry(cfg)
    obj_true = make_test_object(cfg.n_large, seed=seed)

    # Aberrated ground-truth pupil (defocus-like quadratic phase) so pupil
    # recovery does real work — a flat pupil would make EPRY trivially right.
    n = cfg.np_size
    c = round(n / 2)
    r_p = max(pupil_radius(cfg), 1)
    yy, xx = np.mgrid[0:n, 0:n]
    r2 = ((xx - c) ** 2 + (yy - c) ** 2) / r_p**2
    pupil_true = pupil_support(cfg, centered=False).astype(np.complex128)
    pupil_true = pupil_true * np.fft.ifftshift(np.exp(1j * 1.2 * r2))

    images = simulate_images(obj_true, geom, cfg, pupil_true=pupil_true,
                             quantize=True)
    return cfg, geom, images, obj_true


def amp_rmse(obj_crop: np.ndarray, obj_true: np.ndarray) -> float:
    """Scale-invariant relative amplitude RMSE (the repo's accuracy gate)."""
    a, t = np.abs(obj_crop), np.abs(obj_true)
    s = (t * a).sum() / (a * a).sum()
    return float(np.sqrt(((a * s - t) ** 2).mean()) / t.mean())


def run_curve(cfg, geom, images, obj_true, sweeps: int, **kwargs):
    """Per-sweep amp-RMSE curve via 1-sweep resume steps (one compile)."""
    from fpm_tpu.models.epry import reconstruct

    state = None
    curve = []
    for _ in range(sweeps):
        res = reconstruct(images, geom, cfg, iterations=1, dtype="complex64",
                          initial_state=state, collect_metrics=False, **kwargs)
        state = (res.obj_f_centered, res.pupil)
        curve.append(amp_rmse(res.obj_crop, obj_true))
    return curve


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--sweeps", type=int, default=30)
    ap.add_argument("--problems", nargs="*", default=[p[0] for p in PROBLEMS])
    args = ap.parse_args(argv)

    rows = []
    for label, max_na in PROBLEMS:
        if label not in args.problems:
            continue
        cfg, geom, images, obj_true = make_problem(max_na)
        k = int(geom.num_leds)
        base = dict(problem=label, num_leds=k, np_size=cfg.np_size,
                    n_large=cfg.n_large, max_na=max_na)

        seq = run_curve(cfg, geom, images, obj_true, args.sweeps)
        row = dict(base, mode="sequential", rmse_curve=[round(v, 5) for v in seq])
        print(json.dumps(row))
        rows.append(row)

        for label, overrides in VARIANTS:
            cur = run_curve(cfg, geom, images, obj_true, args.sweeps,
                            mode="batched", **overrides)
            row = dict(base, mode=f"batched {label}",
                       rmse_curve=[round(v, 5) for v in cur], **overrides)
            print(json.dumps(row))
            rows.append(row)

    if args.output:
        with open(args.output, "w") as f:
            json.dump(rows, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
