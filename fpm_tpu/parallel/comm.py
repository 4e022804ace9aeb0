"""Per-sweep communication accounting for the sharded sweeps (SURVEY.md N3).

The reference has no communication to account for (single process,
fpmMain.cpp:500-592); every collective in fpm-tpu is new TPU-native design,
so its cost model must be written down to judge the BASELINE.json ≥85%
weak-scaling target without multi-chip hardware. This module computes, from
the same static geometry the sharded sweeps use, exactly which collectives
one sweep issues and how many bytes each moves:

* ``led_shard_comm``  — the chunked Gauss–Seidel-over-Jacobi sweep
  (parallel/led_shard.py): per chunk, one object-increment ``psum``
  (Nlarge² complex), one pupil-consensus ``psum`` (Np² complex), and the
  two scalar metric ``psum``s.
* ``tile_shard_comm`` — the spectrum-row-sharded sweep
  (parallel/tile_shard.py): per sweep, forward + reverse halo ``ppermute``
  (Np·Nlarge complex each, point-to-point over ICI), one extended-block
  ``psum`` over the led axis ((S+Np)·Nlarge complex), the scalar ``pmax``
  realizing the reference's full-spectrum ``cv::minMaxLoc``
  (fpmMain.cpp:467), and the pupil consensus.

Byte counts are *payload* bytes. For a p-device ring all-reduce each device
sends and receives ``2·(p−1)/p × payload`` bytes (reduce-scatter +
all-gather); a ``ppermute`` moves the payload once per device. The
``project_weak_scaling`` model combines these with a measured per-device
compute rate and an assumed per-device ICI bandwidth to produce the
weak-scaling efficiency estimate recorded in SCALING.md.

``hlo_collective_inventory`` cross-checks the analytic model against the
compiled program: it parses the post-optimization HLO of a sharded sweep and
returns every collective op with its payload bytes, so the model is verified
against what XLA actually emits rather than trusted.
"""

from __future__ import annotations

import dataclasses
import math
import re


@dataclasses.dataclass(frozen=True)
class Collective:
    op: str            # 'psum' | 'ppermute' | 'pmax'
    axis: str          # mesh axis/axes
    payload_bytes: int  # bytes reduced/moved per call (one replica's payload)
    calls_per_sweep: int
    what: str          # which solver quantity

    @property
    def bytes_per_sweep(self) -> int:
        return self.payload_bytes * self.calls_per_sweep


def _ring_allreduce_device_bytes(payload: int, p: int) -> int:
    """Bytes sent per device for a p-device ring all-reduce of ``payload``."""
    if p <= 1:
        return 0
    return math.ceil(2 * (p - 1) / p * payload)


def led_shard_comm(
    n_large: int,
    np_size: int,
    k: int,
    chunk_size: int,
    n_led: int,
    dtype_bytes: int = 8,
) -> dict:
    """Collectives one LED-sharded sweep issues (parallel/led_shard.py).

    Mirrors ``reconstruct_led_sharded``'s chunking: the requested chunk is
    rounded up to a multiple of the led-axis size, giving
    ``ceil(K/chunk_eff)`` chunks per sweep, each ending in one object psum +
    one pupil psum (+ 2 scalar metric psums).
    """
    c_req = chunk_size if chunk_size > 0 else k
    c_eff = -(-c_req // n_led) * n_led
    n_chunks = -(-k // c_eff)
    scalar = 4  # f32 metric scalars
    cols = [
        Collective("psum", "led", n_large * n_large * dtype_bytes, n_chunks,
                   "object-spectrum increment consensus"),
        Collective("psum", "led", np_size * np_size * dtype_bytes, n_chunks,
                   "pupil increment consensus"),
        Collective("psum", "led", scalar, 2 * n_chunks, "metrics"),
    ]
    return _summarize(cols, axis_sizes={"led": n_led}, n_chunks=n_chunks)


def tile_shard_comm(
    n_large: int,
    np_size: int,
    k: int,
    n_led: int,
    n_tile: int,
    chunk_size: int = 0,
    dtype_bytes: int = 8,
) -> dict:
    """Collectives one tile-sharded sweep issues (parallel/tile_shard.py).

    Mirrors ``partition_leds_by_tile``'s chunking: ``ceil(K/chunk_size)``
    chunks per sweep (``chunk_size=0`` = one whole-sweep chunk), and *every*
    collective below — forward halo, object consensus, reverse halo, the
    global-max pmax, pupil consensus, metrics — is issued once per chunk
    (the ``lax.scan`` body in ``_tile_sweep``), not once per sweep.
    """
    s = n_large // n_tile
    c = chunk_size if chunk_size > 0 else k
    n_chunks = -(-k // c)
    scalar = 4
    halo = np_size * n_large * dtype_bytes
    cols = [
        Collective("ppermute", "tile", halo, n_chunks,
                   "forward halo (next tile's top Np rows)"),
        Collective("psum", "led", (s + np_size) * n_large * dtype_bytes, n_chunks,
                   "extended-block object increment consensus"),
        Collective("ppermute", "tile", halo, n_chunks,
                   "reverse halo (increments in halo rows)"),
        Collective("pmax", "tile", scalar, n_chunks,
                   "global max|O| (the reference's cv::minMaxLoc, fpmMain.cpp:467)"),
        Collective("psum", "led,tile", np_size * np_size * dtype_bytes, n_chunks,
                   "pupil increment consensus"),
        Collective("psum", "led,tile", scalar, 2 * n_chunks, "metrics"),
    ]
    return _summarize(cols, axis_sizes={"led": n_led, "tile": n_tile},
                      n_chunks=n_chunks)


def _summarize(cols: list[Collective], axis_sizes: dict[str, int], n_chunks: int) -> dict:
    """Totals + per-device wire bytes under the ring-collective model."""
    per_device = 0
    for c in cols:
        if c.op in ("psum", "pmax"):
            p = math.prod(axis_sizes[a] for a in c.axis.split(","))
            per_device += _ring_allreduce_device_bytes(c.payload_bytes, p) * c.calls_per_sweep
        else:  # ppermute: each device sends its payload once per call
            # (a 1-device axis degenerates to a local copy — no wire bytes)
            if all(axis_sizes[a] > 1 for a in c.axis.split(",")):
                per_device += c.payload_bytes * c.calls_per_sweep
    return {
        "collectives": [dataclasses.asdict(c) for c in cols],
        "n_chunks_per_sweep": n_chunks,
        "payload_bytes_per_sweep": sum(c.bytes_per_sweep for c in cols),
        "device_wire_bytes_per_sweep": per_device,
    }


def project_weak_scaling(
    compute_s_per_sweep: float,
    device_wire_bytes: float,
    ici_bandwidth_gbs: float = 45.0,
    overlap: float = 0.0,
    pipelined: bool = False,
    n_chunks: int = 1,
) -> dict:
    """Weak-scaling efficiency estimate at fixed per-device work.

    ``compute_s_per_sweep`` is the measured single-device sweep time for the
    per-device workload; ``device_wire_bytes`` comes from the comm model
    above at the target device count. ``ici_bandwidth_gbs`` defaults to one
    v5e ICI link direction (~45 GB/s; a 2D-torus chip has more aggregate, so
    this is conservative). ``overlap`` ∈ [0, 1] is the fraction of comm
    hidden under compute (0 = fully exposed, the pessimistic bound).

    ``pipelined`` models the one-chunk-stale consensus sweep
    (``stale_consensus``, parallel/led_shard.py): chunk c's all-reduce has
    no data dependence on chunk c+1's compute, so per-chunk comm overlaps
    per-chunk compute — per sweep of ``n_chunks`` chunks,
    ``t = cc + max(cc, mc)·(n_chunks−1) + mc`` with ``cc``/``mc`` the
    per-chunk compute/comm times (prologue computes, epilogue communicates).
    """
    t_comm = device_wire_bytes / (ici_bandwidth_gbs * 1e9)
    if pipelined:
        n = max(1, n_chunks)
        cc = compute_s_per_sweep / n
        mc = t_comm / n
        t_total = cc + max(cc, mc) * (n - 1) + mc
    else:
        t_total = compute_s_per_sweep + (1.0 - overlap) * t_comm
    return {
        "compute_s": compute_s_per_sweep,
        "comm_s": t_comm,
        "efficiency": compute_s_per_sweep / t_total,
        "ici_bandwidth_gbs": ici_bandwidth_gbs,
        "overlap": overlap,
        "pipelined": pipelined,
    }


# A defining HLO collective line reads
#   %name = SHAPE op-name(operands), ...
# where SHAPE is the RESULT shape (after the '='), either one shape like
# ``c128[40,48]{1,0}`` or a tuple like ``(f64[], f64[])`` when XLA combined
# several psums into one all-reduce. The op name must immediately precede
# the '(' of its operand list, which excludes lines that merely *reference*
# a collective as an operand (get-tuple-element, fusion, ...) and the
# ``-done`` halves of async pairs.
_SHAPE_RE = re.compile(r"\b([a-z]+\d+|pred)\[([0-9,]*)\]")
_HLO_DEF_RE = re.compile(
    r"^\s*(?P<shapes>\(?(?:[a-z0-9]+\[[0-9,]*\](?:\{[0-9,]*\})?(?:,\s*)?)+\)?)\s*"
    r"(?P<op>all-reduce|collective-permute|all-gather|reduce-scatter|all-to-all)"
    r"(?P<start>-start)?\("
)

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "c64": 8, "c128": 16,
    "s64": 8, "s32": 4, "u32": 4, "s8": 1, "u8": 1, "pred": 1,
}


def hlo_collective_inventory(hlo_text: str) -> list[dict]:
    """Parse post-optimization HLO for collective ops + payload bytes.

    Returns one entry per *defining* collective op (lines that only
    reference a collective as an operand are skipped, as are the ``-done``
    halves of async pairs), with ``bytes`` = the summed byte size of its
    result shape(s) — a tuple result (XLA's combined all-reduce of several
    psums) counts every element. Used to verify the analytic model against
    what XLA actually emits on the fake-device mesh
    (benchmarks/scaling.py, tests/test_comm.py).
    """
    out = []
    for line in hlo_text.splitlines():
        if "=" not in line:
            continue
        rhs = line.split("=", 1)[1]
        m = _HLO_DEF_RE.match(rhs)
        if not m:
            continue
        nbytes = 0
        for dt, dims in _SHAPE_RE.findall(m.group("shapes")):
            if dt not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * _DTYPE_BYTES[dt]
        # full line kept: callers filter on the metadata op_name scope
        # (e.g. '/shard_map/'), which sits past any reasonable truncation
        out.append({"op": m.group("op"), "bytes": nbytes, "line": line.strip()})
    return out


def consensus_schedule_check(compiled_hlo: str) -> dict:
    """Schedule-level evidence for the stale-consensus overlap claim.

    SCALING.md's pipelined weak-scaling model assumes chunk c's consensus
    all-reduce is ISSUED before chunk c+1's DFT compute, so an async
    backend overlaps them. This inspects the compiled (post-optimization,
    scheduled) module's chunk-loop body — the computation containing both
    the consensus all-reduce and the chunk DFT ops — and reports their
    scheduled positions. In a scheduled HLO body, definitions precede
    uses, so ``consensus before first DFT`` also proves the all-reduce
    consumes no part of that body's chunk compute (the dataflow freedom
    async collectives need); in the non-stale program the same check fails
    because the all-reduce takes this chunk's increments as operands.

    Returns ``{"body": <computation header>, "consensus_idx": i,
    "first_dft_idx": j, "issued_before_compute": i < j}``. Raises
    ValueError if no chunk-loop body is found (e.g. a single-chunk
    program, which has no loop).
    """
    cur_header, cur_lines = None, []
    best = None
    for raw in compiled_hlo.splitlines() + ["}"]:
        if raw.rstrip().endswith("{") and not raw.startswith(" "):
            cur_header, cur_lines = raw.strip(), []
            continue
        if raw.startswith("}"):
            if cur_header and cur_lines:
                found = _scan_body_for_consensus(cur_header, cur_lines)
                if found and (best is None
                              or found["consensus_bytes"] > best["consensus_bytes"]):
                    best = found
            cur_header = None
            continue
        if cur_header is not None:
            cur_lines.append(raw)
    if best is None:
        raise ValueError(
            "no computation with both a consensus all-reduce and DFT ops "
            "found — is this a compiled multi-chunk sharded sweep?"
        )
    return best


_DFT_RE = re.compile(r"= \S+ (fft\(|dot\()|fft_type=")


def _scan_body_for_consensus(header: str, lines: list[str]) -> dict | None:
    consensus_idx, consensus_bytes = None, 0
    first_dft_idx = None
    for i, line in enumerate(lines):
        if "=" not in line:
            continue
        if first_dft_idx is None and _DFT_RE.search(line):
            first_dft_idx = i
        rhs = line.split("=", 1)[1]
        m = _HLO_DEF_RE.match(rhs)
        if m and m.group("op") == "all-reduce":
            nbytes = 0
            for dt, dims in _SHAPE_RE.findall(m.group("shapes")):
                if dt in _DTYPE_BYTES:
                    n = 1
                    for d in dims.split(","):
                        if d:
                            n *= int(d)
                    nbytes += n * _DTYPE_BYTES[dt]
            if nbytes > consensus_bytes:
                consensus_idx, consensus_bytes = i, nbytes
    if consensus_idx is None or first_dft_idx is None:
        return None
    return {
        "body": header[:120],
        "consensus_idx": consensus_idx,
        "first_dft_idx": first_dft_idx,
        "consensus_bytes": consensus_bytes,
        "issued_before_compute": consensus_idx < first_dft_idx,
    }
