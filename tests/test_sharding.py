"""Distributed tests without a cluster (SURVEY.md §4.4).

Run on an 8-fake-device CPU mesh (conftest sets
``--xla_force_host_platform_device_count=8``). The sharded sweeps must be
numerically equivalent to the single-device batched sweep (same math, only
reduction order differs), and converge to the ground truth.
"""

import jax
import numpy as np
import pytest

from fpm_tpu.data.simulate import synthetic_dataset
from fpm_tpu.models.epry import reconstruct
from fpm_tpu.parallel import (
    make_mesh,
    mesh_shape_for,
    reconstruct_led_sharded,
    reconstruct_tile_sharded,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (fake) devices"
)


@pytest.fixture(scope="module")
def ds():
    return synthetic_dataset(np_size=16, grid=5, seed=5)


def _rel(a, b):
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-30)


def test_mesh_shape_for():
    assert mesh_shape_for(8, 48, 16) == (4, 2) or mesh_shape_for(8, 48, 16)[0] * mesh_shape_for(8, 48, 16)[1] == 8
    led, tile = mesh_shape_for(8, 48, 16)
    assert led * tile == 8
    assert 48 // tile >= 16  # halo invariant: tile height >= Np


def test_led_sharded_matches_batched(ds):
    ref = reconstruct(ds.images, ds.geom, ds.cfg, iterations=4,
                      dtype="complex128", mode="batched")
    mesh = make_mesh(led=8, tile=1)
    got = reconstruct_led_sharded(ds.images, ds.geom, ds.cfg, mesh=mesh,
                                  iterations=4, dtype="complex128")
    assert _rel(got.obj_f_centered, ref.obj_f_centered) < 1e-10
    assert _rel(got.pupil, ref.pupil) < 1e-10
    assert _rel(got.obj_crop, ref.obj_crop) < 1e-10


def test_led_sharded_chunked_matches_single_device(ds):
    """Chunked (Gauss–Seidel-over-Jacobi) sharded sweep ≡ single-device:
    chunk_size=8 over K=21 → 3 chunks; c_eff=8 on the 8-device led axis
    gives one LED per device per chunk, with masked padding in chunk 3."""
    ref = reconstruct(ds.images, ds.geom, ds.cfg, iterations=4,
                      dtype="complex128", mode="batched", chunk_size=8)
    mesh = make_mesh(led=8, tile=1)
    got = reconstruct_led_sharded(ds.images, ds.geom, ds.cfg, mesh=mesh,
                                  iterations=4, dtype="complex128",
                                  chunk_size=8)
    assert _rel(got.obj_f_centered, ref.obj_f_centered) < 1e-10
    assert _rel(got.pupil, ref.pupil) < 1e-10


def test_tile_sharded_matches_batched(ds):
    # Nlarge=48, Np=16 → up to 3 tiles; use tile=3 alone (led=1).
    ref = reconstruct(ds.images, ds.geom, ds.cfg, iterations=4,
                      dtype="complex128", mode="batched")
    mesh = make_mesh(led=1, tile=3, devices=jax.devices()[:3])
    got = reconstruct_tile_sharded(ds.images, ds.geom, ds.cfg, mesh=mesh,
                                   iterations=4, dtype="complex128")
    assert _rel(got.obj_f_centered, ref.obj_f_centered) < 1e-10
    assert _rel(got.pupil, ref.pupil) < 1e-10


def test_combined_led_tile_mesh(ds):
    ref = reconstruct(ds.images, ds.geom, ds.cfg, iterations=4,
                      dtype="complex128", mode="batched")
    mesh = make_mesh(led=4, tile=2)
    got = reconstruct_tile_sharded(ds.images, ds.geom, ds.cfg, mesh=mesh,
                                   iterations=4, dtype="complex128")
    assert _rel(got.obj_f_centered, ref.obj_f_centered) < 1e-10
    assert _rel(got.pupil, ref.pupil) < 1e-10


def test_tile_sharded_chunked_matches_single_device(ds):
    """Chunked Gauss–Seidel-over-Jacobi on the row-sharded spectrum ≡ the
    single-device chunked sweep: chunk_size=8 over K=21 → 3 strided chunks,
    each doing its own halo exchange + consensus round."""
    ref = reconstruct(ds.images, ds.geom, ds.cfg, iterations=4,
                      dtype="complex128", mode="batched", chunk_size=8)
    mesh = make_mesh(led=2, tile=3, devices=jax.devices()[:6])
    got = reconstruct_tile_sharded(ds.images, ds.geom, ds.cfg, mesh=mesh,
                                   iterations=4, dtype="complex128",
                                   chunk_size=8)
    assert _rel(got.obj_f_centered, ref.obj_f_centered) < 1e-10
    assert _rel(got.pupil, ref.pupil) < 1e-10


def test_led_sharded_pallas_matches_xla(ds):
    """Pallas-routed per-device chunk body (fused_chunk_increments) ≡ the
    XLA body — same collectives, kernel f32 → f32-level tolerance."""
    mesh = make_mesh(led=8, tile=1)
    ref = reconstruct_led_sharded(ds.images, ds.geom, ds.cfg, mesh=mesh,
                                  iterations=3, dtype="complex64",
                                  chunk_size=8)
    got = reconstruct_led_sharded(ds.images, ds.geom, ds.cfg, mesh=mesh,
                                  iterations=3, dtype="complex64",
                                  chunk_size=8, use_pallas=True,
                                  dft_precision="highest")
    assert _rel(got.obj_f_centered, ref.obj_f_centered) < 1e-5
    assert _rel(got.pupil, ref.pupil) < 1e-4
    for k in ("data_residual", "update_norm"):
        np.testing.assert_allclose(got.metrics[k], ref.metrics[k], rtol=1e-3)


def test_tile_sharded_pallas_matches_xla(ds):
    """Pallas chunk body on the halo-extended tile block ≡ the XLA body,
    on a combined (led, tile) mesh."""
    mesh = make_mesh(led=2, tile=3, devices=jax.devices()[:6])
    ref = reconstruct_tile_sharded(ds.images, ds.geom, ds.cfg, mesh=mesh,
                                   iterations=3, dtype="complex64",
                                   chunk_size=8)
    got = reconstruct_tile_sharded(ds.images, ds.geom, ds.cfg, mesh=mesh,
                                   iterations=3, dtype="complex64",
                                   chunk_size=8, use_pallas=True,
                                   dft_precision="highest")
    assert _rel(got.obj_f_centered, ref.obj_f_centered) < 1e-5
    assert _rel(got.pupil, ref.pupil) < 1e-4
    for k in ("data_residual", "update_norm"):
        np.testing.assert_allclose(got.metrics[k], ref.metrics[k], rtol=1e-3)


def test_sharded_converges_to_truth(ds):
    mesh = make_mesh(led=4, tile=2)
    res = reconstruct_tile_sharded(ds.images, ds.geom, ds.cfg, mesh=mesh,
                                   iterations=25, dtype="complex128")
    a, t = np.abs(res.obj_crop), np.abs(ds.object_true)
    s = (t * a).sum() / (a * a).sum()
    rmse = np.sqrt(((a * s - t) ** 2).mean()) / t.mean()
    assert rmse < 0.08


def test_tile_shard_rejects_wraparound_halo(ds):
    from fpm_tpu.parallel.tile_shard import partition_leds_by_tile

    # Since round 5 small tiles are legal (multi-hop halo); the remaining
    # structural limit is the halo wrapping the ring back onto its owner.
    with pytest.raises(ValueError, match="wrap"):
        partition_leds_by_tile(ds.geom, 48, 3, 1, 40)  # Np 40 > 48-16


def test_tile_sharded_multihop_halo_matches_single_device(ds):
    """Tile height BELOW the patch size (the round-4 structural limit,
    SCALING.md p=8 footnote): Nlarge=48 over 6 tiles -> 8-row tiles vs
    Np=16, a 2-hop halo. The trajectory must still equal the single-device
    chunked sweep."""
    ref = reconstruct(ds.images, ds.geom, ds.cfg, iterations=4,
                      dtype="complex128", mode="batched", chunk_size=8)
    mesh = make_mesh(led=1, tile=6, devices=jax.devices()[:6])
    got = reconstruct_tile_sharded(ds.images, ds.geom, ds.cfg, mesh=mesh,
                                   iterations=4, dtype="complex128",
                                   chunk_size=8)
    assert _rel(got.obj_f_centered, ref.obj_f_centered) < 1e-10
    assert _rel(got.pupil, ref.pupil) < 1e-10
    # 3-hop (8 tiles x 6-row tiles) with a combined led axis... exceeds the
    # 8-device test mesh; 2 tiles x 8 rows below Np with led=2 covers the
    # combined-axes multihop case.
    mesh2 = make_mesh(led=2, tile=4)
    got2 = reconstruct_tile_sharded(ds.images, ds.geom, ds.cfg, mesh=mesh2,
                                    iterations=4, dtype="complex128",
                                    chunk_size=8)
    assert _rel(got2.obj_f_centered, ref.obj_f_centered) < 1e-10


def test_stale_consensus_mesh_invariant(ds):
    """One-chunk-stale pipelining (the weak-scaling overlap lever) is a
    well-defined SPMD trajectory: identical across mesh sizes up to
    reduction order."""
    a = reconstruct_led_sharded(ds.images, ds.geom, ds.cfg,
                                mesh=make_mesh(led=8, tile=1),
                                iterations=4, dtype="complex128",
                                chunk_size=8, stale_consensus=True)
    b = reconstruct_led_sharded(ds.images, ds.geom, ds.cfg,
                                mesh=make_mesh(led=2, tile=1,
                                               devices=jax.devices()[:2]),
                                iterations=4, dtype="complex128",
                                chunk_size=8, stale_consensus=True)
    assert _rel(a.obj_f_centered, b.obj_f_centered) < 1e-10
    assert _rel(a.pupil, b.pupil) < 1e-10
    # ...and it is a *different* trajectory from the fresh-consensus sweep
    # (one chunk of Gauss-Seidel freshness given up), not a silent no-op.
    fresh = reconstruct_led_sharded(ds.images, ds.geom, ds.cfg,
                                    mesh=make_mesh(led=8, tile=1),
                                    iterations=4, dtype="complex128",
                                    chunk_size=8)
    assert _rel(a.obj_f_centered, fresh.obj_f_centered) > 1e-8


def test_stale_consensus_single_chunk_equals_fresh(ds):
    """With one chunk per sweep there is nothing to pipeline: stale and
    fresh sweeps are the same trajectory."""
    kw = dict(mesh=make_mesh(led=8, tile=1), iterations=3,
              dtype="complex128", chunk_size=0)
    a = reconstruct_led_sharded(ds.images, ds.geom, ds.cfg,
                                stale_consensus=True, **kw)
    b = reconstruct_led_sharded(ds.images, ds.geom, ds.cfg, **kw)
    assert _rel(a.obj_f_centered, b.obj_f_centered) < 1e-12


def test_bf16_comm_close_to_f32(ds):
    """comm_precision='bf16' (halved consensus payloads) stays close to the
    f32-comm trajectory and still converges to the truth."""
    mesh = make_mesh(led=8, tile=1)
    kw = dict(mesh=mesh, iterations=6, dtype="complex64", chunk_size=8,
              use_pallas=True, dft_precision="highest")
    f32 = reconstruct_led_sharded(ds.images, ds.geom, ds.cfg, **kw)
    b16 = reconstruct_led_sharded(ds.images, ds.geom, ds.cfg,
                                  comm_precision="bf16", **kw)
    assert _rel(b16.obj_f_centered, f32.obj_f_centered) < 0.05

    def amp_rmse(res):
        a, t = np.abs(res.obj_crop), np.abs(ds.object_true)
        s = (t * a).sum() / (a * a).sum()
        return float(np.sqrt(((a * s - t) ** 2).mean()) / t.mean())

    assert amp_rmse(b16) < 1.3 * amp_rmse(f32) + 0.01


def test_bf16_comm_requires_pallas(ds):
    with pytest.raises(ValueError, match="bf16"):
        reconstruct_led_sharded(ds.images, ds.geom, ds.cfg,
                                mesh=make_mesh(led=8, tile=1),
                                iterations=1, dtype="complex128",
                                comm_precision="bf16")


def test_tile_sharded_bf16_comm_close_to_f32(ds):
    mesh = make_mesh(led=2, tile=2, devices=jax.devices()[:4])
    kw = dict(mesh=mesh, iterations=4, dtype="complex64", chunk_size=8,
              use_pallas=True, dft_precision="highest")
    f32 = reconstruct_tile_sharded(ds.images, ds.geom, ds.cfg, **kw)
    b16 = reconstruct_tile_sharded(ds.images, ds.geom, ds.cfg,
                                   comm_precision="bf16", **kw)
    assert _rel(b16.obj_f_centered, f32.obj_f_centered) < 0.05


def test_tile_stale_consensus_mesh_invariant(ds):
    """Tile-sharded stale pipelining: same trajectory across mesh shapes,
    equal to the LED-sharded stale trajectory up to reduction order (both
    are 'chunk c+1 computed before chunk c's consensus lands')."""
    a = reconstruct_tile_sharded(ds.images, ds.geom, ds.cfg,
                                 mesh=make_mesh(led=4, tile=2),
                                 iterations=4, dtype="complex128",
                                 chunk_size=8, stale_consensus=True)
    b = reconstruct_tile_sharded(ds.images, ds.geom, ds.cfg,
                                 mesh=make_mesh(led=1, tile=2,
                                                devices=jax.devices()[:2]),
                                 iterations=4, dtype="complex128",
                                 chunk_size=8, stale_consensus=True)
    assert _rel(a.obj_f_centered, b.obj_f_centered) < 1e-10
    assert _rel(a.pupil, b.pupil) < 1e-10
    # different trajectory from fresh consensus (not a silent no-op)
    fresh = reconstruct_tile_sharded(ds.images, ds.geom, ds.cfg,
                                     mesh=make_mesh(led=4, tile=2),
                                     iterations=4, dtype="complex128",
                                     chunk_size=8)
    assert _rel(a.obj_f_centered, fresh.obj_f_centered) > 1e-8


def test_tile_stale_matches_led_stale(ds):
    """The stale trajectory is an algorithm, not an implementation detail:
    tile-sharded and LED-sharded stale sweeps agree up to reduction order.

    Chunk membership must match: partition_leds_by_tile and chunk_schedule
    share strided semantics, so the same chunk c sees the same LED set."""
    t = reconstruct_tile_sharded(ds.images, ds.geom, ds.cfg,
                                 mesh=make_mesh(led=1, tile=2,
                                                devices=jax.devices()[:2]),
                                 iterations=3, dtype="complex128",
                                 chunk_size=8, stale_consensus=True)
    led = reconstruct_led_sharded(ds.images, ds.geom, ds.cfg,
                                  mesh=make_mesh(led=2, tile=1,
                                                 devices=jax.devices()[:2]),
                                  iterations=3, dtype="complex128",
                                  chunk_size=8, stale_consensus=True)
    assert _rel(t.obj_f_centered, led.obj_f_centered) < 1e-10
    assert _rel(t.pupil, led.pupil) < 1e-10


def test_make_mesh_rejects_degenerate_axes():
    """ADVICE r4: make_mesh(tile=8) on a smaller host must raise a clear
    error, not return an empty mesh (led = n // tile == 0)."""
    import jax
    import pytest

    from fpm_tpu.parallel import make_mesh

    n = len(jax.devices())
    with pytest.raises(ValueError, match="mesh axes must be >= 1"):
        make_mesh(tile=2 * n)
    with pytest.raises(ValueError, match="mesh axes must be >= 1"):
        make_mesh(led=0, tile=1)


def test_led_sharded_single_device_whole_sweep_chunk(ds):
    """Round-5 review regression: reconstruct_led_sharded with the default
    chunk_size=0 on an n_led=1 mesh crashed reshaping into a zero-width
    chunk; it must run (one whole-sweep Jacobi chunk) and match the
    single-device whole-sweep batched solve."""
    mesh = make_mesh(led=1, tile=1, devices=jax.devices()[:1])
    got = reconstruct_led_sharded(ds.images, ds.geom, ds.cfg, mesh=mesh,
                                  iterations=3, dtype="complex128")
    ref = reconstruct(ds.images, ds.geom, ds.cfg, iterations=3,
                      dtype="complex128", mode="batched", chunk_size=0)
    assert _rel(got.obj_f_centered, ref.obj_f_centered) < 1e-12
