"""Time-attribution ablations of the fused Pallas sweep (benchmark-only).

The whole sweep is ONE pallas_call, so xprof can't break down where the
per-LED time goes. This harness times kernel variants with individual stages
disabled (``fused_epry_sweep(..., ablate=...)``) and reports the per-LED
delta vs the full kernel — the cost attribution that drives optimization:

* ``omax-const``       — skip the per-LED full-spectrum max|O| reduction
                         (the reference's cv::minMaxLoc over objF,
                         fpmMain.cpp:467)
* ``no-dft``           — skip the 4 MXU matmul-DFT stages (IFFT+FFT)
* ``no-window-read``   — read the patch from a static corner instead of the
                         dynamic roll-aligned window
* ``no-window-write``  — skip the object-update scatter-add window write
* ``dft-1pass``        — run each DFT block matmul as a single bf16 pass
                         with plain casts (garbage numerics): isolates the
                         extra split passes from the fixed per-matmul chain
                         latency

Timing is differential over the LED count (t(K_hi) − t(K_lo)) / (K_hi − K_lo)
so per-sweep wrapper costs (pupil frame rolls, spectrum pad) cancel; sync is
a scalar fetch of the pupil output (block_until_ready does not block over
the axon tunnel — see bench.bench_tpu).

Usage: python benchmarks/ablate.py [--np-size 90] [-o results.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = ["", "omax-const", "no-dft", "no-window-read", "no-window-write",
            "dft-1pass"]


def setup():
    import functools

    import jax
    import jax.numpy as jnp

    from bench import make_problem
    from fpm_tpu.geometry import pupil_support
    from fpm_tpu.models.epry import (EPRYOptions, _planes,
                                     _sorted_device_inputs, init_traced)

    cfg, geom, images = make_problem()
    amps, starts = _sorted_device_inputs(images, geom, jnp.complex64)
    support_r = jnp.asarray(pupil_support(cfg, centered=False), jnp.float32)
    opts = EPRYOptions.from_config(cfg, dtype="complex64")

    # Complex buffers must never cross the host↔device boundary (the axon
    # tunnel can't transfer them); build the init state inside a jit with
    # real-plane inputs/outputs, exactly like models.epry._run_jit.
    @functools.partial(jax.jit, static_argnames=("opts",))
    def init_planes(amps, support_r, opts):
        obj_f, pupil = init_traced(amps, support_r, opts)
        return _planes(obj_f), _planes(pupil)

    o_planes, p_planes = init_planes(amps, support_r, opts)
    return cfg, amps.astype(jnp.float32), starts, o_planes, p_planes, support_r


def time_variant(cfg, amps, starts, o, p, sup, *, ablate, dft_precision,
                 pupil_radius=0, global_max="exact", s_lo=10, s_hi=110, reps=8):
    """Per-LED seconds via the differential sweep-count rig (bench.bench_tpu):
    scan s sweeps inside one jitted program, per-LED = Δt/(Δs·K)."""
    import functools

    import jax
    import jax.numpy as jnp

    from fpm_tpu.ops.pallas_kernels import fused_epry_sweep

    k = amps.shape[0]
    starts_flat = starts.reshape(-1)

    @functools.partial(jax.jit, static_argnames=("n_sweeps",))
    def run_sweeps(o, p, sup, amps, starts_flat, n_sweeps):
        def body(carry, _):
            o, p = carry
            o, p, _mets = fused_epry_sweep(
                o, p, sup, amps, starts_flat,
                np_size=cfg.np_size, n_large=cfg.n_large,
                delta1=cfg.delta1, delta2=cfg.delta2, eps=cfg.eps,
                dft_precision=dft_precision, ablate=ablate,
                pupil_radius=pupil_radius, global_max=global_max,
            )
            return (o, p), None

        (o, p), _ = jax.lax.scan(body, (o, p), None, length=n_sweeps)
        return jnp.sum(p)

    def one(n_sweeps):
        t0 = time.perf_counter()
        float(run_sweeps(o, p, sup, amps, starts_flat, n_sweeps))
        return time.perf_counter() - t0

    # Interleave lo/hi reps (device clock drift would otherwise bias the
    # differential), take min of each.
    one(s_lo), one(s_hi)  # compile + warm
    t_lo = t_hi = None
    for _ in range(reps):
        tl, th = one(s_lo), one(s_hi)
        t_lo = tl if t_lo is None else min(t_lo, tl)
        t_hi = th if t_hi is None else min(t_hi, th)
    return (t_hi - t_lo) / ((s_hi - s_lo) * k)


CHUNKED_VARIANTS = ["", "no-dft", "no-window-read", "no-window-write",
                    "omax-const", "no-pupil-acc", "dft-1pass"]


def time_chunked_variant(cfg, amps, starts, o, p, sup, *, chunk, ablate,
                         dft_precision, pupil_radius, s_lo=10, s_hi=110,
                         reps=8):
    """Per-slot seconds of the chunked kernel (same differential rig)."""
    import functools

    import jax
    import jax.numpy as jnp

    from fpm_tpu.models.epry import chunk_schedule
    from fpm_tpu.ops.pallas_kernels import fused_epry_chunked

    k = amps.shape[0]
    perm, mask_np, n_chunks = chunk_schedule(k, chunk, "strided")
    pad = perm.size - k
    a, s = amps, starts
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        s = jnp.concatenate([s, jnp.zeros((pad, 2), s.dtype)])
    c = perm.size // n_chunks
    amps_it = a[jnp.asarray(perm)].reshape(n_chunks, c, *a.shape[1:])
    starts_flat = s[jnp.asarray(perm)].reshape(-1).astype(jnp.int32)
    valid = jnp.asarray((mask_np > 0).astype("int32"))
    n_slots = perm.size

    @functools.partial(jax.jit, static_argnames=("n_sweeps",))
    def run_sweeps(o, p, sup, amps_it, starts_flat, valid, n_sweeps):
        def body(carry, _):
            o, p = carry
            o, p, _m = fused_epry_chunked(
                o, p, sup, amps_it, starts_flat, valid,
                np_size=cfg.np_size, n_large=cfg.n_large,
                delta1=cfg.delta1, delta2=cfg.delta2, eps=cfg.eps,
                dft_precision=dft_precision, pupil_radius=pupil_radius,
                ablate=ablate,
            )
            return (o, p), None

        (o, p), _ = jax.lax.scan(body, (o, p), None, length=n_sweeps)
        return jnp.sum(p)

    def one(n_sweeps):
        t0 = time.perf_counter()
        float(run_sweeps(o, p, sup, amps_it, starts_flat, valid, n_sweeps))
        return time.perf_counter() - t0

    one(s_lo), one(s_hi)
    t_lo = t_hi = None
    for _ in range(reps):
        tl, th = one(s_lo), one(s_hi)
        t_lo = tl if t_lo is None else min(t_lo, tl)
        t_hi = th if t_hi is None else min(t_hi, th)
    return (t_hi - t_lo) / ((s_hi - s_lo) * n_slots)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--chunked", action="store_true",
                    help="ablate the chunked (headline) kernel instead of "
                         "the sequential one")
    ap.add_argument("--chunk", type=int, default=32)
    args = ap.parse_args(argv)

    import jax

    if jax.default_backend() != "tpu":
        print("ablate.py requires the TPU backend", file=sys.stderr)
        return 1

    from fpm_tpu.geometry import pupil_radius as _pupil_radius

    cfg, amps, starts, o, p, sup = setup()
    radius = _pupil_radius(cfg)
    rows = []
    base_ns = None

    if args.chunked:
        for ablate in CHUNKED_VARIANTS:
            sec = time_chunked_variant(
                cfg, amps, starts, o, p, sup, chunk=args.chunk,
                ablate=ablate, dft_precision="bf16x3", pupil_radius=radius,
                reps=args.reps,
            )
            ns = sec * 1e9
            row = {"kernel": "chunked", "chunk": args.chunk,
                   "ablate": ablate or "(full)", "ns_per_slot": round(ns, 1)}
            if ablate == "":
                base_ns = ns
            else:
                row["delta_vs_full_ns"] = round(ns - base_ns, 1)
            print(json.dumps(row), flush=True)
            rows.append(row)
        if args.output:
            with open(args.output, "w") as f:
                json.dump(rows, f, indent=2)
        return 0

    configs = (
        [("bf16x3", a, radius, "exact") for a in VARIANTS]
        + [
            ("bf16x3", "", 0, "exact"),       # bbox off → its cost
            ("bf16x3", "", radius, "lazy"),   # lazy sweep-start max|O|
            ("highest", "", radius, "exact"),
            ("highest", "no-dft", radius, "exact"),
        ]
    )
    for precision, ablate, pr, gmax in configs:
        sec = time_variant(cfg, amps, starts, o, p, sup,
                           ablate=ablate, dft_precision=precision,
                           pupil_radius=pr, global_max=gmax, reps=args.reps)
        ns = sec * 1e9
        row = {"dft_precision": precision, "ablate": ablate or "(full)",
               "pupil_bbox": bool(pr), "global_max": gmax,
               "ns_per_led": round(ns, 1)}
        if ablate == "" and precision == "bf16x3" and pr and gmax == "exact":
            base_ns = ns
        elif base_ns is not None:
            row["delta_vs_full_ns"] = round(ns - base_ns, 1)
        print(json.dumps(row))
        rows.append(row)
    if args.output:
        with open(args.output, "w") as f:
            json.dump(rows, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
