"""Analytic comm model vs the compiled programs (SURVEY.md N3; SCALING.md §1).

The weak-scaling projection is only as good as its communication model, so
the model is verified against what XLA actually emits: the sharded sweeps
are lowered on the fake-device mesh and ``hlo_collective_inventory``'s
payload multiset must equal ``led_shard_comm``/``tile_shard_comm``'s.
"""

import numpy as np

from fpm_tpu.parallel.comm import (
    hlo_collective_inventory,
    led_shard_comm,
    tile_shard_comm,
)

from benchmarks.scaling import crosscheck_led, crosscheck_tile


def test_led_model_matches_hlo():
    ok, detail = crosscheck_led()
    assert ok, detail
    assert detail["n_chunks"] > 1  # the chunked path, not whole-sweep Jacobi


def test_tile_model_matches_hlo():
    ok, detail = crosscheck_tile()
    assert ok, detail
    assert detail["hlo_ppermute_payloads"], "halo exchange missing from HLO"


def test_tile_model_counts_chunks():
    """ADVICE r2: every tile-sweep collective fires once PER CHUNK."""
    m1 = tile_shard_comm(360, 90, 193, n_led=1, n_tile=2, chunk_size=0)
    m32 = tile_shard_comm(360, 90, 193, n_led=1, n_tile=2, chunk_size=32)
    assert m1["n_chunks_per_sweep"] == 1
    assert m32["n_chunks_per_sweep"] == 7
    for c in m32["collectives"]:
        assert c["calls_per_sweep"] % 7 == 0, c
    assert (
        m32["device_wire_bytes_per_sweep"]
        == 7 * m1["device_wire_bytes_per_sweep"]
    )


def test_led_model_counts_chunks():
    m = led_shard_comm(360, 90, k=193, chunk_size=32, n_led=4)
    # chunk rounded up to a multiple of n_led (32 already is): 7 chunks
    assert m["n_chunks_per_sweep"] == 7
    obj = next(c for c in m["collectives"] if "object" in c["what"])
    assert obj["payload_bytes"] == 360 * 360 * 8
    assert obj["calls_per_sweep"] == 7


def test_hlo_parser_reads_result_shapes():
    """ADVICE r2: shapes sit AFTER '='; operand references don't count."""
    hlo = "\n".join([
        "  %psum.1 = c128[40,48]{1,0} all-reduce(%fusion.1), replica_groups={{0,1}}",
        "  %mets = (f64[], f64[]) all-reduce(%a, %b), replica_groups={{0,1}}",
        "  %gte = f64[] get-tuple-element(%all-reduce), index=0",
        "  %fused = c128[24,48]{1,0} fusion(%collective-permute), kind=kLoop",
        "  %pp = c128[16,48]{1,0} collective-permute(%slice), source_target_pairs={{0,1}}",
        "  %done = c128[8,8]{1,0} all-reduce-done(%start)",
    ])
    inv = hlo_collective_inventory(hlo)
    assert [(e["op"], e["bytes"]) for e in inv] == [
        ("all-reduce", 40 * 48 * 16),
        ("all-reduce", 16),
        ("collective-permute", 16 * 48 * 16),
    ]


def test_ring_allreduce_scaling():
    payloads = [
        led_shard_comm(360, 90, 193, 32, p)["device_wire_bytes_per_sweep"]
        for p in (1, 2, 8)
    ]
    assert payloads[0] == 0  # single device: no wire bytes
    # 2(p-1)/p factor: p=8 moves 1.75x the bytes of p=2
    assert np.isclose(payloads[2] / payloads[1], 1.75, rtol=1e-6)


def test_bf16_comm_all_reduces_are_bf16_in_the_program():
    """The bf16 consensus lever really requests bf16 all-reduce payloads.

    Checked at the StableHLO level: the XLA *CPU* backend widens bf16
    collectives back to f32 during optimization (CpuFloatSupport), so the
    post-optimization inventory can't show the halving on the test
    backend — on TPU bf16 collectives are kept. The object-increment
    (2, Nlarge, Nlarge) and pupil-numerator (2, Np, Np) psums must both
    appear as bf16 all_reduces in the lowered program."""
    import jax
    import jax.numpy as jnp

    from fpm_tpu.data.simulate import synthetic_dataset
    from fpm_tpu.parallel.led_shard import _run_led_sharded, prepare_led_sharded
    from fpm_tpu.parallel.mesh import make_mesh

    ds = synthetic_dataset(np_size=16, grid=5, seed=3)
    mesh = make_mesh(led=8, tile=1)
    args, opts = prepare_led_sharded(
        ds.images, ds.geom, ds.cfg, mesh, iterations=1, dtype="complex64",
        chunk_size=8, use_pallas=True, comm_precision="bf16",
    )
    txt = _run_led_sharded.lower(*args, opts, mesh).as_text()
    nl = ds.cfg.n_large
    assert f"tensor<2x{nl}x{nl}xbf16>" in txt, "object psum not bf16"
    assert f"tensor<2x{ds.cfg.np_size}x{ds.cfg.np_size}xbf16>" in txt, \
        "pupil psum not bf16"
    # and the f32 run does NOT carry bf16 spectra
    args2, opts2 = prepare_led_sharded(
        ds.images, ds.geom, ds.cfg, mesh, iterations=1, dtype="complex64",
        chunk_size=8, use_pallas=True,
    )
    txt2 = _run_led_sharded.lower(*args2, opts2, mesh).as_text()
    assert f"tensor<2x{nl}x{nl}xbf16>" not in txt2


def test_led_model_matches_hlo_realistic_shape():
    """VERDICT r3 item 9: the crosscheck at the real mono headline shape
    (K=193, Np=90, Nlarge=360), not just the toy problem."""
    from fpm_tpu.config import FPMConfig
    from fpm_tpu.data.simulate import make_test_object, simulate_images
    from fpm_tpu.geometry import compute_geometry

    cfg = FPMConfig(max_illumination_na=0.45, np_size=90, iterations=1)
    geom = compute_geometry(cfg)
    assert geom.num_leds == 193
    obj_true = make_test_object(cfg.n_large, seed=0)
    images = simulate_images(obj_true, geom, cfg, quantize=True)
    ok, detail = crosscheck_led(chunk_size=32, n_led=8,
                                problem=(cfg, geom, images))
    assert ok, detail
    assert detail["n_chunks"] == 7


def test_stale_consensus_allreduce_scheduled_before_next_chunk_compute():
    """VERDICT r4 missing #4: schedule-level evidence for the pipelining
    claim. In the compiled stale-consensus program the chunk-loop body must
    schedule the consensus all-reduce BEFORE the chunk's first DFT op —
    position in a scheduled body implies the all-reduce consumes none of
    that chunk's compute, which is exactly the freedom an async backend
    needs to overlap them (SCALING.md pipelined model t = cc + max(cc,mc)
    ·(n−1) + mc). The same check must FAIL on the non-stale program (its
    all-reduce takes this chunk's increments as operands), so the check is
    discriminative, not vacuous."""
    from fpm_tpu.data.simulate import synthetic_dataset
    from fpm_tpu.parallel.comm import consensus_schedule_check
    from fpm_tpu.parallel.led_shard import _run_led_sharded, prepare_led_sharded
    from fpm_tpu.parallel.mesh import make_mesh

    ds = synthetic_dataset(np_size=16, grid=5, seed=3)
    mesh = make_mesh(led=2, tile=1)

    def compiled(stale):
        args, opts = prepare_led_sharded(
            ds.images, ds.geom, ds.cfg, mesh, iterations=1, dtype="complex64",
            chunk_size=4, stale_consensus=stale,
        )
        return _run_led_sharded.lower(*args, opts, mesh).compile().as_text()

    stale = consensus_schedule_check(compiled(True))
    assert stale["issued_before_compute"], stale
    # consensus payload really is the object+pupil tuple (c64)
    assert stale["consensus_bytes"] == (48 * 48 + 16 * 16) * 8

    plain = consensus_schedule_check(compiled(False))
    assert not plain["issued_before_compute"], plain
