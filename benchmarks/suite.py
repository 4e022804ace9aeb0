"""Benchmark suite: all five reference dataset-config workloads + roofline.

``bench.py`` at the repo root prints the single headline metric the driver
records (mono-equivalent workload). This suite sweeps every bundled reference
config's derived problem size (SURVEY.md §0 dataset files; sizes from the
C++ derivation formulas, fpmMain.cpp:529-565), measures the fused-Pallas
sequential sweep, the unfused XLA sequential sweep, and the batched (Jacobi)
sweep, and reports per-workload MXU utilization against the matmul-DFT FLOP
count — the SURVEY.md §4.5 "roofline check".

FLOP accounting (per LED, per sweep, fused-Pallas path):
  * IFFT + FFT of the Np² patch as complex matmul-DFTs: 2 DFTs x 2 complex
    matmuls x 4 real (Np,Np)@(Np,Np) matmuls x 2·Np³ FLOPs = 32·Np³.
  * Element-wise updates are O(Np²) — negligible against the matmuls.
  * The per-LED global max|O| reads the Nlarge² spectrum (VPU, not MXU).

Usage:  python benchmarks/suite.py [--quick] [-o results.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Derived sizes of the five bundled reference configs (dataset.json and
# dataset_mono.json share the mono optics). maxIlluminationNA picked so the
# built-in dome table yields the same order of LED count the reference's
# profiled run used (~156-193, BASELINE.md).
WORKLOADS = {
    # name: (np_size, pixel_size, objective_mag, objective_na, max_na, lambda)
    "mono":       dict(np_size=90,  pixel_size=6.5, objective_mag=8.0,
                       objective_na=0.2, max_illumination_na=0.45,
                       wavelength=0.5),          # Nlarge=360 (dataset_mono.json)
    "mono-full":  dict(np_size=90,  pixel_size=6.5, objective_mag=8.0,
                       objective_na=0.2, max_illumination_na=0.7604,
                       wavelength=0.5),          # the mono DEFAULT NA filter
    #                    (fpmMain.cpp:528): full 508-LED dome, ~80% darkfield,
    #                    Nlarge=450 — the heaviest bundled-config workload
    "cellscope":  dict(np_size=100, pixel_size=6.9, objective_mag=8.25,
                       objective_na=0.30, max_illumination_na=0.55,
                       wavelength=0.45),         # Nlarge=600-ish (dataset_cellScope.json)
    "dogstomach": dict(np_size=200, pixel_size=6.5, objective_mag=8.0,
                       objective_na=0.2, max_illumination_na=0.30,
                       wavelength=0.63),         # Np=200 histology (dataset_dogStomach.json)
}


def make_problem(name: str):
    from fpm_tpu.config import FPMConfig
    from fpm_tpu.data.simulate import make_test_object, simulate_images
    from fpm_tpu.geometry import compute_geometry

    cfg = FPMConfig(iterations=1, **WORKLOADS[name])
    geom = compute_geometry(cfg)
    obj_true = make_test_object(cfg.n_large, seed=0)
    images = simulate_images(obj_true, geom, cfg, quantize=True)
    return cfg, geom, images


def timed_solver(cfg, geom, images, reps, lo, hi, **solver_kwargs):
    """Differential device-resident timing — same rig as bench.bench_tpu
    (device inputs placed once, scalar-fetch sync, (t_hi-t_lo)/(hi-lo))."""
    from bench import bench_tpu

    return bench_tpu(cfg, geom, images, reps=reps, lo=lo, hi=hi, **solver_kwargs)


def run_workload(name: str, quick: bool):
    import jax

    cfg, geom, images = make_problem(name)
    on_tpu = jax.default_backend() == "tpu"
    k = int(geom.num_leds)
    row = {
        "workload": name, "np_size": cfg.np_size, "n_large": cfg.n_large,
        "num_leds": k, "backend": jax.default_backend(),
    }

    reps = 4 if quick else 8
    if on_tpu:
        from bench import _flop_accounting

        from fpm_tpu.geometry import pupil_radius
        from fpm_tpu.models.epry import chunk_schedule, effective_chunk_size

        # Headline-equivalent mode per workload: the chunked-batched fused-
        # Pallas sweep (shardable, fastest — bench.py) at the recommended
        # chunk 32 strided (convergence matches sequential,
        # benchmarks/convergence.py), auto-clamped to the kernel's compile
        # ceiling (Np=200 → chunk 16; ops/pallas_kernels.max_pallas_chunk).
        eff_chunk = effective_chunk_size(cfg.np_size, 32, k, True, "batched")
        row["headline_chunk_size"] = eff_chunk
        fps_bp, sec_bp = timed_solver(cfg, geom, images, reps, 10, 110,
                                      mode="batched", chunk_size=32,
                                      use_pallas=True, collect_metrics=False)
        fps_p, sec_p = timed_solver(cfg, geom, images, reps, 10, 110,
                                    use_pallas=True, collect_metrics=False)
        fps_x, _ = timed_solver(cfg, geom, images, reps, 10, 110)
        fps_b, _ = timed_solver(cfg, geom, images, reps, 10, 110,
                                mode="batched", chunk_size=32)
        # Honest FLOP accounting (VERDICT r2): report both the naive counted
        # full-patch number AND the executed pupil-bbox contraction FLOPs;
        # "utilization" is computed from EXECUTED bf16 MXU FLOPs only.
        perm, _mask, _nc = chunk_schedule(k, eff_chunk, "strided")
        flops = _flop_accounting(cfg, geom, sec_bp, pupil_radius(cfg), perm.size)
        row.update(
            batched_chunk32_pallas_led_frames_per_s=round(fps_bp, 1),
            sequential_pallas_led_frames_per_s=round(fps_p, 1),
            xla_seq_led_frames_per_s=round(fps_x, 1),
            batched_chunk32_xla_led_frames_per_s=round(fps_b, 1),
            batched_pallas_seconds_per_iter=round(sec_bp, 6),
            sequential_pallas_seconds_per_iter=round(sec_p, 6),
            **flops,
        )
    else:
        fps_x, sec_x = timed_solver(cfg, geom, images, 2, 2, 8)
        row.update(xla_seq_led_frames_per_s=round(fps_x, 1),
                   seconds_per_iter=round(sec_x, 6))
    return row


def run_ingest_benchmark(quick: bool):
    """Ingest stage: TIFF decode + preprocess throughput, native vs Python.

    The reference spent ~22% of its wall-clock here (cv::imread 11.9% +
    TIFFReadEncodedStrip 10.4%, BASELINE.md /root/reference/output.svg);
    the native runtime (fpm_tpu/native/fpm_io.cpp) was built to kill that
    cost, and since round 5 decodes LZW/Deflate (the common microscope
    encodings) natively rather than falling back per-file to PIL. Measures
    frames/s and decoded MB/s for the ROI path on camera-scale frames
    (1024x1024 uint16 -> Np=90 ROI crop), per compression, plus the
    full-frame (large-FOV) path.
    """
    import shutil
    import tempfile

    from PIL import Image

    from fpm_tpu import native
    from fpm_tpu.config import FPMConfig
    from fpm_tpu.data.loader import load_dataset

    k = 24 if quick else 64
    frame = 512 if quick else 1024
    rng = np.random.default_rng(0)
    # Realistic content: smooth background + speckle, so LZW/Deflate see
    # compressible but non-trivial data.
    yy, xx = np.mgrid[0:frame, 0:frame]
    base = (8000 + 6000 * np.sin(xx / 97.0) * np.cos(yy / 61.0)).astype(np.uint16)

    rows = []
    root = tempfile.mkdtemp(prefix="fpm_ingest_")
    try:
        for comp_name, pil_kw in (("uncompressed", {}),
                                  ("lzw", {"compression": "tiff_lzw"}),
                                  ("deflate",
                                   {"compression": "tiff_adobe_deflate"})):
            d = os.path.join(root, comp_name)
            os.makedirs(d)
            disk_bytes = 0
            for led in range(1, k + 1):
                img = base + rng.integers(0, 2000, base.shape).astype(np.uint16)
                p = os.path.join(d, f"iLED_{led}.tif")
                Image.fromarray(img).save(p, **pil_kw)
                disk_bytes += os.path.getsize(p)
            coords = np.zeros((k, 3))
            coords[:, 0] = np.linspace(-5, 5, k)
            coords[:, 2] = 60.0
            # Background windows scale with the frame so both loaders see
            # in-bounds windows in --quick (frame=512) too.
            bk2 = frame - 90 - 10
            cfg = FPMConfig(
                dataset_root=d + os.sep, np_size=90,
                crop_x=frame // 2 - 45, crop_y=frame // 2 - 45,
                bk1_crop_x=10, bk1_crop_y=10, bk2_crop_x=bk2, bk2_crop_y=bk2,
                bg_threshold=500.0, pixel_size=6.5, objective_mag=8.0,
                objective_na=0.2, max_illumination_na=0.9, wavelength=0.5,
                led_count=k, hole_coordinates=coords,
            )
            raw_mb = k * frame * frame * 2 / 1e6
            for mode, use_native in (("native", True), ("python", False)):
                if use_native and not native.available():
                    continue
                reps = []
                for _ in range(2 if quick else 3):
                    t0 = time.perf_counter()
                    ds = load_dataset(cfg, use_native=use_native)
                    reps.append(time.perf_counter() - t0)
                    assert ds.images.shape == (k, 90, 90)
                t = min(reps)
                rows.append({
                    "workload": "ingest", "compression": comp_name,
                    "mode": mode, "frames": k, "frame_px": frame,
                    "disk_mb": round(disk_bytes / 1e6, 1),
                    "frames_per_s": round(k / t, 1),
                    "decoded_mb_per_s": round(raw_mb / t, 1),
                })
            # full-frame (large-FOV ingest) path, native only
            if native.available():
                reps = []
                for _ in range(2 if quick else 3):
                    t0 = time.perf_counter()
                    ds = load_dataset(cfg, use_native=True, full_frames=True)
                    reps.append(time.perf_counter() - t0)
                    assert ds.images.shape == (k, frame, frame)
                t = min(reps)
                rows.append({
                    "workload": "ingest", "compression": comp_name,
                    "mode": "native-fullframe", "frames": k, "frame_px": frame,
                    "frames_per_s": round(k / t, 1),
                    "decoded_mb_per_s": round(raw_mb / t, 1),
                })
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return rows


def run_rgb_benchmark(quick: bool):
    """RGB channel batching: one 3-channel compiled program vs 3 dispatches.

    The --color-mode rgb solve runs the three channels as ONE vmapped
    program (models/epry.py _run_jit_channels) instead of three sequential
    dispatches of the same compiled solve. Measures both at the mono
    workload (XLA batched-chunk32 path — the one vmap batches onto the
    MXU) with the same differential device-timing methodology as bench.py.
    """
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        return []
    from bench import bench_tpu

    from fpm_tpu.geometry import pupil_support
    from fpm_tpu.models.epry import (
        EPRYOptions,
        _run_jit_channels,
        _sorted_device_inputs,
    )

    cfg, geom, images = make_problem("mono")
    k = int(geom.num_leds)
    reps, lo, hi = (3, 5, 25) if quick else (4, 5, 45)

    amps, starts = _sorted_device_inputs(images, geom, jnp.complex64)
    amps_b = jnp.stack([amps, amps * 0.9, amps * 1.1])
    support_r = jnp.asarray(pupil_support(cfg, centered=False), jnp.float32)
    obj0 = jnp.zeros((3, 2, cfg.n_large, cfg.n_large), jnp.float32)
    pup0 = jnp.zeros((3, 2, cfg.np_size, cfg.np_size), jnp.float32)

    def wait(res):
        return float(jnp.sum(res[1]))

    def timed(iters):
        opts = EPRYOptions.from_config(
            cfg, iterations=iters, dtype="complex64", mode="batched",
            chunk_size=32, collect_metrics=False,
        )
        wait(_run_jit_channels(amps_b, starts, support_r, obj0, pup0, opts, False))
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            wait(_run_jit_channels(amps_b, starts, support_r, obj0, pup0,
                                   opts, False))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    t_lo, t_hi = timed(lo), timed(hi)
    if t_hi <= t_lo:  # tunnel stall guard (bench.py methodology)
        t_lo, t_hi = timed(lo), timed(hi)
    sec3 = max(t_hi - t_lo, 1e-9) / (hi - lo)
    _fps1, sec1 = bench_tpu(cfg, geom, images, reps=reps, lo=lo, hi=hi,
                            mode="batched", chunk_size=32,
                            collect_metrics=False)
    return [{
        "workload": "rgb3-batched", "np_size": cfg.np_size,
        "n_large": cfg.n_large, "num_leds": k,
        "channels": 3, "mode": "batched-chunk32-xla(vmap)",
        "seconds_per_iter_3ch_batched": round(sec3, 6),
        "seconds_per_iter_1ch_x3": round(3 * sec1, 6),
        "batched_speedup_vs_3_dispatches": round(3 * sec1 / sec3, 2),
        "led_frames_per_s_3ch": round(3 * k / sec3, 1),
    }]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--workloads", nargs="*",
                    default=list(WORKLOADS) + ["ingest", "rgb3"])
    args = ap.parse_args(argv)

    from bench import _setup_compilation_cache

    _setup_compilation_cache()
    rows = []
    for name in args.workloads:
        if name in ("ingest", "rgb3"):
            fn = run_ingest_benchmark if name == "ingest" else run_rgb_benchmark
            for row in fn(args.quick):
                print(json.dumps(row))
                rows.append(row)
            continue
        row = run_workload(name, args.quick)
        print(json.dumps(row))
        rows.append(row)
    if args.output:
        with open(args.output, "w") as f:
            json.dump(rows, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
