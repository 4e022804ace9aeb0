"""Weak-scaling evidence for the sharded sweeps (BASELINE.md ≥85% target).

The reference is single-process (no communication to measure,
/root/reference/fpmMain.cpp:500-592) and this rig has one TPU chip, so the
multi-chip story is validated in two halves:

1. **HLO cross-check** (runs here, on the 8-fake-device CPU mesh): lower the
   led-sharded and tile-sharded sweeps, inventory every collective XLA
   actually emits (``comm.hlo_collective_inventory``), and assert the
   analytic model (``comm.led_shard_comm`` / ``comm.tile_shard_comm``)
   predicts exactly those payloads. This is the verification the comm
   module's docstring promises; it is also run as a regression test
   (tests/test_comm.py).
2. **Projection** (needs one measured number): combine the measured
   single-chip batched-sweep seconds/iteration with the model's per-device
   wire bytes at 2/4/8 devices under the ring-collective model and a
   conservative single-direction ICI bandwidth (45 GB/s per v5e link) →
   weak-scaling efficiency table written to SCALING.md.

Weak-scaling convention: per-device work is held fixed at the full
single-chip workload (K LEDs per device, K·p total at p devices) with the
per-device chunk width fixed (chunk_size scales as 32·p so every device
still batches 32 LEDs per chunk and the chunk count per sweep is
unchanged). Tile-sharding weak scaling grows the spectrum with p
(n_large·p rows total, n_large per device).

Usage:  python benchmarks/scaling.py [--write-md] [--seconds-per-iter S]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SECONDARY = os.path.join(_REPO, "benchmarks", "results_secondary.json")
SCALING_MD = os.path.join(_REPO, "SCALING.md")

# Bytes per complex spectrum sample on the wire. The scaling (Pallas f32)
# path psums float32 (real, imag) planes → 8 bytes; the f64 parity path
# (CPU cross-check) moves c128 → 16 bytes.
F32_PLANES_BYTES = 8
BF16_PLANES_BYTES = 4   # comm_precision='bf16': halved consensus payloads
C128_BYTES = 16


# --------------------------------------------------------------------------
# Part 1: HLO cross-check on the fake-device mesh
# --------------------------------------------------------------------------

def _sweep_collectives(hlo_text: str) -> list[dict]:
    """Inventory entries emitted *inside* the shard_map sweep body.

    Filters out egress collectives (the final full-spectrum ifft lowers to
    an all-gather + fft outside the sweep).
    """
    from fpm_tpu.parallel.comm import hlo_collective_inventory

    return [e for e in hlo_collective_inventory(hlo_text) if "/shard_map/" in e["line"]]


def _combined_match(want: list[int], got: list[int]) -> bool:
    """True when ``got`` is exactly ``want`` up to XLA's all-reduce combining:
    every got entry must equal the sum of a disjoint subset of want entries,
    covering all of want (no bytes invented, none dropped). Brute-force over
    subsets — the lists are a handful of entries."""
    if sum(want) != sum(got):
        return False
    if not got:
        return not want

    def solve(remaining_want: tuple, remaining_got: tuple) -> bool:
        if not remaining_got:
            return not remaining_want
        target, rest = remaining_got[0], remaining_got[1:]
        n = len(remaining_want)
        for bits in range(1, 1 << n):
            sub = [remaining_want[i] for i in range(n) if bits >> i & 1]
            if sum(sub) == target:
                left = list(remaining_want)
                for s in sub:
                    left.remove(s)
                if solve(tuple(left), rest):
                    return True
        return False

    return solve(tuple(want), tuple(got))


def _match_model(model: dict, inventory: list[dict], *, scalar_cutoff: int = 64):
    """Assert the analytic model's per-call payloads == what XLA emits.

    Compares the multiset of non-scalar payloads (psum/pmax ↔ all-reduce,
    ppermute ↔ collective-permute), allowing XLA's all-reduce combiner to
    merge adjacent psums — a merged op must account byte-exactly for a
    disjoint subset of model payloads (``_combined_match``). Scalar
    collectives (metric psums, the pmax) are checked for presence only,
    because XLA combines adjacent scalar all-reduces into one tuple-shaped
    op and widens f32 scalars to f64 under x64.

    Returns (ok, detail_dict). Model ``calls_per_sweep`` counts runtime scan
    trips; each per-chunk collective appears once in the scan body's HLO, so
    payloads are compared per call, not summed.
    """
    want_ar = sorted(
        c["payload_bytes"] for c in model["collectives"]
        if c["op"] in ("psum", "pmax") and c["payload_bytes"] > scalar_cutoff
    )
    want_pp = sorted(
        c["payload_bytes"] for c in model["collectives"]
        if c["op"] == "ppermute" and c["payload_bytes"] > scalar_cutoff
    )
    n_scalar_want = sum(
        1 for c in model["collectives"] if c["payload_bytes"] <= scalar_cutoff
    )

    got_ar = sorted(
        e["bytes"] for e in inventory
        if e["op"] in ("all-reduce", "reduce-scatter", "all-gather")
        and e["bytes"] > scalar_cutoff
    )
    got_pp = sorted(
        e["bytes"] for e in inventory
        if e["op"] == "collective-permute" and e["bytes"] > scalar_cutoff
    )
    n_scalar_got = sum(1 for e in inventory if e["bytes"] <= scalar_cutoff)

    ok = (
        _combined_match(want_ar, got_ar)
        and want_pp == got_pp
        and (n_scalar_want == 0) == (n_scalar_got == 0)
    )
    return ok, {
        "model_allreduce_payloads": want_ar,
        "hlo_allreduce_payloads": got_ar,
        "model_ppermute_payloads": want_pp,
        "hlo_ppermute_payloads": got_pp,
        "model_scalar_collectives": n_scalar_want,
        "hlo_scalar_collectives": n_scalar_got,
    }


def crosscheck_led(np_size=16, grid=5, chunk_size=8, n_led=8,
                   dtype="complex128", use_pallas=False,
                   comm_precision="f32", problem=None):
    """Lower the led-sharded sweep on the fake mesh; model vs HLO.

    ``use_pallas`` routes through the f32-planes Pallas body (payloads =
    2 planes × 4 B = 8 B/sample; ``comm_precision='bf16'`` halves that to
    4 B/sample — the weak-scaling lever whose bytes this verifies).
    ``problem`` optionally supplies a prebuilt (cfg, geom, images) — used
    for the realistic-shape (K=193, Np=90) crosscheck.
    """
    import jax

    from fpm_tpu.data.simulate import synthetic_dataset
    from fpm_tpu.parallel.comm import led_shard_comm
    from fpm_tpu.parallel.led_shard import _run_led_sharded, prepare_led_sharded
    from fpm_tpu.parallel.mesh import make_mesh

    assert jax.default_backend() == "cpu" and len(jax.devices()) >= n_led
    if problem is None:
        ds = synthetic_dataset(np_size=np_size, grid=grid, seed=3)
        cfg, geom, images = ds.cfg, ds.geom, ds.images
    else:
        cfg, geom, images = problem
    mesh = make_mesh(led=n_led, tile=1, devices=jax.devices()[:n_led])
    kw = {}
    if use_pallas:
        kw = dict(use_pallas=True, comm_precision=comm_precision)
    args, opts = prepare_led_sharded(
        images, geom, cfg, mesh, iterations=1, dtype=dtype,
        chunk_size=chunk_size, **kw,
    )
    hlo = _run_led_sharded.lower(*args, opts, mesh).compile().as_text()
    k = int(geom.num_leds)
    if use_pallas:
        dtype_bytes = 4 if comm_precision == "bf16" else 8  # (re, im) planes
    else:
        dtype_bytes = C128_BYTES if dtype == "complex128" else 8
    model = led_shard_comm(
        cfg.n_large, cfg.np_size, k, chunk_size, n_led,
        dtype_bytes=dtype_bytes,
    )
    ok, detail = _match_model(model, _sweep_collectives(hlo))
    return ok, {"what": "led_shard", "k": k, "n_led": n_led,
                "n_chunks": model["n_chunks_per_sweep"], **detail}


def crosscheck_tile(np_size=16, grid=5, chunk_size=8, n_led=4, n_tile=2):
    """Lower the tile-sharded sweep on the fake mesh; model vs HLO."""
    import jax

    from fpm_tpu.data.simulate import synthetic_dataset
    from fpm_tpu.parallel.comm import tile_shard_comm
    from fpm_tpu.parallel.mesh import make_mesh
    from fpm_tpu.parallel.tile_shard import _run_tile_sharded, prepare_tile_sharded

    assert jax.default_backend() == "cpu" and len(jax.devices()) >= n_led * n_tile
    ds = synthetic_dataset(np_size=np_size, grid=grid, seed=3)
    mesh = make_mesh(led=n_led, tile=n_tile,
                     devices=jax.devices()[: n_led * n_tile])
    args, opts, s, nt = prepare_tile_sharded(
        ds.images, ds.geom, ds.cfg, mesh, iterations=1, dtype="complex128",
        chunk_size=chunk_size,
    )
    hlo = _run_tile_sharded.lower(*args, opts, mesh, s, nt).compile().as_text()
    k = int(ds.geom.num_leds)
    model = tile_shard_comm(
        ds.cfg.n_large, ds.cfg.np_size, k, n_led, n_tile,
        chunk_size=chunk_size, dtype_bytes=C128_BYTES,
    )
    ok, detail = _match_model(model, _sweep_collectives(hlo))
    return ok, {"what": "tile_shard", "k": k, "n_led": n_led, "n_tile": n_tile,
                "n_chunks": model["n_chunks_per_sweep"], **detail}


# --------------------------------------------------------------------------
# Part 2: weak-scaling projection from the measured single-chip sweep
# --------------------------------------------------------------------------

# The headline bench workload (bench.py): mono optics + dome LEDs.
MONO = dict(n_large=360, np_size=90, k=193, chunk=32)
# The heaviest bundled workload (benchmarks/suite.py dogstomach).
DOG = dict(n_large=600, np_size=200, k=137, chunk=32)


def project_led(work: dict, sec_per_iter: float, devices=(2, 4, 8),
                ici_gbs=45.0, comm_bytes=F32_PLANES_BYTES,
                pipelined=False) -> list[dict]:
    """Weak scaling over the LED axis: K·p LEDs total, K per device.

    ``comm_bytes`` = wire bytes per complex spectrum sample (8 = f32
    planes; 4 = the ``comm_precision='bf16'`` lever). ``pipelined`` models
    the ``stale_consensus`` lever (comm model docstring).
    """
    from fpm_tpu.parallel.comm import led_shard_comm, project_weak_scaling

    rows = []
    for p in devices:
        m = led_shard_comm(
            work["n_large"], work["np_size"], k=work["k"] * p,
            chunk_size=work["chunk"] * p, n_led=p,
            dtype_bytes=comm_bytes,
        )
        proj = project_weak_scaling(
            sec_per_iter, m["device_wire_bytes_per_sweep"],
            ici_bandwidth_gbs=ici_gbs, pipelined=pipelined,
            n_chunks=m["n_chunks_per_sweep"],
        )
        rows.append({"devices": p, "axis": "led",
                     "n_chunks": m["n_chunks_per_sweep"],
                     "wire_mb_per_device": round(m["device_wire_bytes_per_sweep"] / 1e6, 3),
                     # 6 decimals: comm_s/compute_s are O(100 µs); 4 would
                     # quantize them to 0.1 ms steps inconsistent with the
                     # efficiency column (advisor r3 finding)
                     **{kk: round(vv, 6) if isinstance(vv, float) else vv
                        for kk, vv in proj.items()}})
    return rows


def project_tile_strong(work: dict, sec_per_iter: float, devices=(2, 4, 8),
                        ici_gbs=45.0, comm_bytes=F32_PLANES_BYTES,
                        pipelined=False) -> list[dict]:
    """Strong scaling over the tile axis: one fixed reconstruction, the
    spectrum row-sharded over p devices (each also takes 1/p of the LEDs —
    owner-computes). Compute shrinks as 1/p; the wire cost is the per-chunk
    halo pair + pupil consensus (the object psum rides the size-1 led axis
    for free). Efficiency = T1 / (p · Tp). ``comm_bytes``/``pipelined``
    model the bf16-payload and stale-pipelining levers (both implemented
    for the tile sweep — parallel/tile_shard.py)."""
    from fpm_tpu.parallel.comm import tile_shard_comm

    rows = []
    for p in devices:
        # Tiles smaller than a patch use the multi-hop halo
        # (ceil(Np/height) ppermute hops per direction, implemented round
        # 5 in parallel/tile_shard.py). The wire BYTES are
        # hop-count-independent (Np halo rows in, Np increment rows back,
        # whatever neighbor count supplies them), so the single model row
        # covers both; multihop rows are footnoted in SCALING.md.
        multihop = work["n_large"] // p < work["np_size"]
        m = tile_shard_comm(
            work["n_large"], work["np_size"], k=work["k"],
            n_led=1, n_tile=p, chunk_size=work["chunk"],
            dtype_bytes=comm_bytes,
        )
        t_comm = m["device_wire_bytes_per_sweep"] / (ici_gbs * 1e9)
        n = max(1, m["n_chunks_per_sweep"])
        if pipelined:
            cc = sec_per_iter / p / n
            mc = t_comm / n
            t_p = cc + max(cc, mc) * (n - 1) + mc
        else:
            t_p = sec_per_iter / p + t_comm
        rows.append({
            "devices": p, "axis": "tile(strong)",
            "n_chunks": m["n_chunks_per_sweep"],
            "wire_mb_per_device": round(m["device_wire_bytes_per_sweep"] / 1e6, 3),
            "compute_s": round(sec_per_iter / p, 6),
            "comm_s": round(t_comm, 6),
            "efficiency": round(sec_per_iter / (p * t_p), 4),
            "ici_bandwidth_gbs": ici_gbs,
            "pipelined": pipelined,
            "multihop": multihop,
        })
    return rows


def project_roi(sec_per_iter: float, devices=(2, 4, 8)) -> list[dict]:
    """Weak scaling over independent large-FOV ROI tiles (models/largefov.py,
    parallel/roi_shard.py): each device reconstructs its own ROIs; the only
    cross-device traffic is the final host gather of recovered fields —
    OUTSIDE the iteration loop. Per-sweep wire bytes are zero, so projected
    weak-scaling efficiency is 100% up to host-gather bandwidth; this is the
    production scale-out mode for wide-field imaging."""
    return [{"devices": p, "axis": "roi", "n_chunks": 0,
             "wire_mb_per_device": 0.0, "compute_s": round(sec_per_iter, 6),
             "comm_s": 0.0, "efficiency": 1.0} for p in devices]


def _measured_sec_per_iter() -> tuple[float | None, str]:
    if os.path.exists(SECONDARY):
        with open(SECONDARY) as f:
            doc = json.load(f)
        h = doc.get("headline", {})
        if h.get("backend") == "tpu" and "seconds_per_iteration" in h:
            return float(h["seconds_per_iteration"]), (
                f"bench.py headline ({h.get('mode')}, "
                f"{h.get('value', 0):,} LED-frames/s)"
            )
    return None, "no measured TPU number found (run bench.py on the chip)"


def _md_table(rows: list[dict]) -> str:
    hdr = ("| devices | chunks/sweep | wire MB/device/sweep | comm ms | "
           "compute ms | efficiency |\n|---|---|---|---|---|---|")
    lines = [hdr]
    for r in rows:
        lines.append(
            f"| {r['devices']}{'†' if r.get('multihop') else ''} | "
            f"{r['n_chunks']} | {r['wire_mb_per_device']} | "
            f"{r['comm_s'] * 1e3:.3f} | {r['compute_s'] * 1e3:.3f} | "
            f"**{r['efficiency'] * 100:.1f}%** |"
        )
    return "\n".join(lines)


def write_scaling_md(sec, source, roi_rows, led32, led96, led_lever,
                     tile_rows, tile_lever, checks):
    check_lines = "\n".join(
        f"* `{d['what']}` (k={d['k']}, chunks={d['n_chunks']}): "
        f"all-reduce payloads {d['hlo_allreduce_payloads']} B, "
        f"ppermute payloads {d['hlo_ppermute_payloads']} B — "
        f"{'MATCH' if ok else 'MISMATCH'}"
        for ok, d in checks
    )
    lever_summary = ", ".join(
        f"p={r['devices']}: {r['efficiency'] * 100:.0f}%" for r in led_lever
    )
    body = f"""# SCALING — multi-chip scaling evidence (single-chip rig)

No multi-chip hardware is attached to this rig, so the ≥85% weak-scaling
target (BASELINE.md) is evidenced in verifiable halves: the compiled
programs' communication is inventoried from their HLO and matched against
an analytic model, and that verified model is combined with the measured
single-chip sweep time to project efficiency. Regenerate with
`python benchmarks/scaling.py --write-md`; the HLO cross-check is also a
regression test (`tests/test_comm.py`).

## 1. The compiled programs move exactly the bytes the model says

The sharded sweeps were lowered on the 8-fake-device CPU mesh and every
collective in the compiled HLO inventoried
(`fpm_tpu/parallel/comm.hlo_collective_inventory`); the analytic model
(`comm.led_shard_comm` / `comm.tile_shard_comm`) predicts the same
per-call payload multiset:

{check_lines}

## 2. Projections

Measured single-chip input: **{sec * 1e6:.0f} µs/iteration** — {source}.
Model: ring collectives (2·(p−1)/p × payload per device per psum), halos
move their payload once, **45 GB/s** per-device collective bandwidth (one
v5e ICI link direction — conservative: ring all-reduces use both ring
directions, roughly doubling effective bandwidth, and XLA can overlap
collectives with compute; `overlap=0` everywhere below). Payloads are the
f32 (real,imag) planes the fused Pallas chunk kernel ships.

### ROI-axis weak scaling — the production scale-out mode

Wide-field imaging is why FPM reconstructions need many chips: the frame is
tiled into overlapping ROIs (`models/largefov.py`) and ROIs are independent
reconstructions — `parallel/roi_shard.py` fans them out across devices with
**zero per-sweep collectives** (the only cross-device traffic is the final
field gather, outside the iteration loop).

{_md_table(roi_rows)}

This mode meets the ≥85% target by construction at any device count; the
sharded-solver modes below are for when a *single* ROI must go faster or
its spectrum outgrows HBM, and their projections are reported honestly —
including where they fall short.

### LED-axis weak scaling — single ROI, mono headline workload (Np=90, Nlarge=360, K=193/device)

Per-device work fixed: K LEDs per device (K·p total), per-device chunk
width fixed (global chunk scales with p), so chunks/sweep is invariant.

chunk 32/device:

{_md_table(led32)}

chunk 96/device (convergent at stride ≥4 on all dome problems,
benchmarks/convergence.py — 3× fewer consensus rounds; realizable only
through the XLA body: the fused chunk kernel's compile ceiling caps
per-device chunks at 34 for Np=90, ops/pallas_kernels.py):

{_md_table(led96)}

chunk 32/device **with both round-4 levers** — `comm_precision='bf16'`
(halves every consensus payload; payload bytes verified at the program
level, tests/test_comm.py) + `stale_consensus` (one-chunk-stale pipelining:
chunk c's all-reduce has no data dependence on chunk c+1's DFT compute, so
it overlaps; convergence pinned at K=193 in
tests/test_batched_convergence.py). Pipelining hides per-chunk comm under
per-chunk compute whenever mc < cc — chunk 32's 7 chunks/sweep give
cc ≈ 25 µs against mc ≈ 12–21 µs at p=2–8, so the smaller chunk is the
BETTER levered configuration (and the one the headline kernel compiles).
Pipelined model: t = cc + max(cc, mc)·(n−1) + mc over n chunks:

{_md_table(led_lever)}

The mono workload is the *hardest* case for LED-axis weak scaling: per-LED
compute is tiny (90² patches) while the object consensus moves the full
360² spectrum every chunk. Unlevered, LED-sharding mono is comm-dominated
at p≥4 on one link direction. With the two implemented levers the model
clears the ≥85% target at every projected device count
({lever_summary})
— on one ICI link direction, zero credit for bidirectional rings. The
caveat stated plainly: the overlap itself cannot be *measured* on this
single-chip rig; what is verified is (a) the issue-before-compute
placement in the COMPILED SCHEDULE — the chunk-loop body of the compiled
stale program schedules the consensus all-reduce before the chunk's first
DFT op, so the all-reduce consumes none of that chunk's compute (the
dataflow freedom an async backend needs), while the same check fails on
the non-stale program (`parallel/comm.py consensus_schedule_check`,
pinned discriminatively in `tests/test_comm.py::
test_stale_consensus_allreduce_scheduled_before_next_chunk_compute`),
(b) the exact bytes on the wire, and (c) the stale trajectory's
convergence.

### Tile-axis strong scaling — single ROI, fixed spectrum (mono)

One fixed reconstruction, spectrum rows sharded (each device also owns the
LEDs whose patches land in its rows — owner-computes): compute shrinks 1/p,
the wire carries only the Np-row halo pair per chunk + pupil consensus
(the object psum rides the size-1 led axis for free).

{_md_table(tile_rows)}

With both levers — bf16 payloads + stale pipelining, both implemented for
the tile sweep too (`parallel/tile_shard.py`; trajectory equals the
LED-sharded stale trajectory up to reduction order, tests/test_sharding.py):

{_md_table(tile_lever)}

† p=8 splits the 360-row spectrum into 45-row tiles, below the Np=90
sub-aperture: the halo takes ceil(Np/45)=2 `ppermute` hops per direction
(multi-hop halo, implemented in `parallel/tile_shard.py` and pinned
against the single-device trajectory in `tests/test_sharding.py::
test_tile_sharded_multihop_halo_matches_single_device`). Wire bytes are
hop-count-independent, so the same model covers it; the row is reported
because strong scaling past p=Nlarge/Np is exactly where the mode stops
paying (p=8 levered: {tile_lever[2]['efficiency'] * 100:.0f}%).

### Reading

ROI parallelism is the scale-out answer and meets the target outright.
For single-ROI scaling, tile-sharding beats LED-sharding because it keeps
the full-spectrum all-reduce off the wire; both are latency/bandwidth-bound
on the mono workload's tiny compute and improve directly with patch size
(dogStomach's per-LED compute is ~5× mono's for the same wire bytes).
The two implemented levers change the picture: with bf16 payloads +
stale pipelining, LED-axis weak scaling clears ≥85% at p=2–8 and tile-axis
strong scaling reaches ~{tile_lever[0]['efficiency'] * 100:.0f}% at p=2
(p=4 remains comm-bound at ~{tile_lever[1]['efficiency'] * 100:.0f}% —
strong scaling shrinks compute while the halo/pupil wire stays constant,
the honest limit). This matches the scaling-book recipe: shard the axis
whose per-device footprint grows, keep dense all-reduces off the critical
path, and overlap the rest.
"""
    with open(SCALING_MD, "w") as f:
        f.write(body)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--write-md", action="store_true")
    ap.add_argument("--seconds-per-iter", type=float, default=None,
                    help="override the measured single-chip sweep time")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    checks = [crosscheck_led(), crosscheck_tile()]
    for ok, d in checks:
        print(json.dumps({"crosscheck": d["what"], "ok": ok, **d}))
        if not ok:
            return 1

    sec, source = (args.seconds_per_iter, "user-provided") \
        if args.seconds_per_iter else _measured_sec_per_iter()
    if sec is None:
        print(json.dumps({"projection": "skipped", "reason": source}))
        return 0

    roi_rows = project_roi(sec)
    led32 = project_led(MONO, sec)
    led96 = project_led({**MONO, "chunk": 96}, sec)
    # Lever projection at chunk 32/device: the fused chunk kernel's compile
    # ceiling caps per-device chunks at 34 for Np=90 (ops/pallas_kernels.py
    # _CHUNK_ROWS_LIMIT), so chunk 96/device is only realizable through the
    # slower XLA body — the honest levered projection uses the chunk size
    # the headline kernel actually runs.
    led_lever = project_led(MONO, sec,
                            comm_bytes=BF16_PLANES_BYTES, pipelined=True)
    tile_rows = project_tile_strong(MONO, sec)
    tile_lever = project_tile_strong(MONO, sec,
                                     comm_bytes=BF16_PLANES_BYTES,
                                     pipelined=True)
    for r in roi_rows + led32 + led96 + led_lever + tile_rows + tile_lever:
        print(json.dumps(r))
    if args.write_md:
        write_scaling_md(sec, source, roi_rows, led32, led96, led_lever,
                         tile_rows, tile_lever, checks)
        print(json.dumps({"wrote": SCALING_MD}))
    return 0


if __name__ == "__main__":
    _flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"
    sys.exit(main())
