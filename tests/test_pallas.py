"""Fused Pallas sweep (interpret mode on CPU) vs the jnp sequential sweep."""

import numpy as np
import pytest

from fpm_tpu.data.simulate import synthetic_dataset
from fpm_tpu.models.epry import reconstruct


@pytest.fixture(scope="module")
def ds():
    return synthetic_dataset(np_size=16, grid=5, seed=9)


@pytest.mark.parametrize("dft_precision,tol_o,tol_p", [
    ("highest", 1e-5, 1e-4),   # exact f32 matmuls: f32 round-off only
    ("bf16x3", 5e-5, 5e-4),    # 3-pass bf16 split: ~2e-6 rel on full recon
])
def test_pallas_sweep_matches_sequential(ds, dft_precision, tol_o, tol_p):
    ref = reconstruct(ds.images, ds.geom, ds.cfg, iterations=2, dtype="complex64",
                      collect_metrics=False)
    got = reconstruct(ds.images, ds.geom, ds.cfg, iterations=2, dtype="complex64",
                      use_pallas=True, dft_precision=dft_precision)
    rel_o = np.abs(got.obj_f_centered - ref.obj_f_centered).max() / (
        np.abs(ref.obj_f_centered).max()
    )
    rel_p = np.abs(got.pupil - ref.pupil).max() / np.abs(ref.pupil).max()
    assert rel_o < tol_o
    assert rel_p < tol_p


def test_pallas_convergence(ds):
    res = reconstruct(ds.images, ds.geom, ds.cfg, iterations=20, dtype="complex64",
                      use_pallas=True)
    a, t = np.abs(res.obj_crop), np.abs(ds.object_true)
    s = (t * a).sum() / (a * a).sum()
    rmse = np.sqrt(((a * s - t) ** 2).mean()) / t.mean()
    assert rmse < 0.08


def test_pallas_support_bbox_matches_sequential():
    """np_size=64 → pupil bbox (48, 8) < patch: exercises the bbox-restricted
    kernel path (reads/writes/FFT stages at b < Np), which must stay
    bit-equivalent to the full sweep since the pupil is exactly zero
    outside its NA-disk support."""
    from fpm_tpu.geometry import pupil_radius
    from fpm_tpu.ops.pallas_kernels import _support_bbox

    ds = synthetic_dataset(np_size=64, grid=5, seed=3)
    b, lo = _support_bbox(ds.cfg.np_size, pupil_radius(ds.cfg))
    assert b < ds.cfg.np_size  # the point of this test
    ref = reconstruct(ds.images, ds.geom, ds.cfg, iterations=2, dtype="complex64",
                      collect_metrics=False)
    got = reconstruct(ds.images, ds.geom, ds.cfg, iterations=2, dtype="complex64",
                      use_pallas=True, dft_precision="highest")
    rel_o = np.abs(got.obj_f_centered - ref.obj_f_centered).max() / (
        np.abs(ref.obj_f_centered).max()
    )
    rel_p = np.abs(got.pupil - ref.pupil).max() / np.abs(ref.pupil).max()
    assert rel_o < 1e-5
    assert rel_p < 1e-4
    # outside the support the recovered pupil must be exactly zero
    sup = np.fft.ifftshift(
        np.pad(np.ones((b, b)), ((lo, 64 - lo - b), (lo, 64 - lo - b)))
    )
    assert np.abs(got.pupil[sup == 0]).max() == 0.0


def test_pallas_lazy_global_max_matches_xla_lazy(ds):
    ref = reconstruct(ds.images, ds.geom, ds.cfg, iterations=2, dtype="complex64",
                      global_max="lazy", collect_metrics=False)
    got = reconstruct(ds.images, ds.geom, ds.cfg, iterations=2, dtype="complex64",
                      use_pallas=True, global_max="lazy", dft_precision="highest")
    rel_o = np.abs(got.obj_f_centered - ref.obj_f_centered).max() / (
        np.abs(ref.obj_f_centered).max()
    )
    assert rel_o < 1e-5


@pytest.mark.parametrize("np_size,chunk,prec,tol_o,tol_p", [
    (16, 7, "highest", 1e-5, 1e-4),   # 25 LEDs / chunk 7 → 4 chunks, 3 dummies
    (16, 8, "bf16x3", 5e-5, 5e-4),
    (64, 6, "highest", 1e-5, 1e-4),   # bbox b < Np path
    (16, 0, "highest", 1e-5, 1e-4),   # whole-sweep Jacobi (single chunk)
])
def test_chunked_pallas_matches_batched_xla(np_size, chunk, prec, tol_o, tol_p):
    """fused_epry_chunked ≡ sweep_batched (the shardable mode) per chunk
    config, incl. masked padding dummies and the pupil-support bbox."""
    ds = synthetic_dataset(np_size=np_size, grid=5, seed=3)
    ref = reconstruct(ds.images, ds.geom, ds.cfg, iterations=2, dtype="complex64",
                      mode="batched", chunk_size=chunk, collect_metrics=False)
    got = reconstruct(ds.images, ds.geom, ds.cfg, iterations=2, dtype="complex64",
                      mode="batched", chunk_size=chunk, use_pallas=True,
                      dft_precision=prec)
    rel_o = np.abs(got.obj_f_centered - ref.obj_f_centered).max() / (
        np.abs(ref.obj_f_centered).max()
    )
    rel_p = np.abs(got.pupil - ref.pupil).max() / np.abs(ref.pupil).max()
    assert rel_o < tol_o
    assert rel_p < tol_p


def test_chunk_compile_guard():
    """The fused chunked kernels refuse chunks over the calibrated Mosaic
    compile ceiling with a clear error (instead of a remote-compile crash),
    and reconstruct auto-clamps the chunk size (VERDICT r3 item 2)."""
    import jax.numpy as jnp
    import pytest as _pytest

    from fpm_tpu.models.epry import effective_chunk_size
    from fpm_tpu.ops.pallas_kernels import (
        _CHUNK_ROWS_LIMIT,
        fused_epry_chunked,
        max_pallas_chunk,
    )

    # Calibration points measured on v5e hardware (round 4).
    assert max_pallas_chunk(200) == 16   # dogStomach: chunk20 failed, 16 ok
    assert max_pallas_chunk(90) >= 32    # mono headline chunk32 compiles
    assert max_pallas_chunk(100) == 32   # cellscope chunk32 compiles (311 s)
    assert 32 * 96 <= _CHUNK_ROWS_LIMIT  # mono chunk32 stays admissible

    # Direct kernel call over the ceiling: clear ValueError at trace time.
    n, c = 200, 32
    with _pytest.raises(ValueError, match="compile ceiling"):
        fused_epry_chunked(
            jnp.zeros((2, 600, 600), jnp.float32),
            jnp.zeros((2, n, n), jnp.float32),
            jnp.zeros((n, n), jnp.float32),
            jnp.zeros((1, c, n, n), jnp.float32),
            jnp.zeros((2 * c,), jnp.int32),
            jnp.ones((c,), jnp.int32),
            np_size=n, n_large=600, delta1=5.0, delta2=100.0, eps=1e-10,
            interpret=False,
        )

    # effective_chunk_size: clamps pallas-batched, passes through the rest.
    assert effective_chunk_size(200, 32, 88, True, "batched") == 16
    assert effective_chunk_size(200, 32, 88, False, "batched") == 32
    assert effective_chunk_size(200, 32, 88, True, "sequential") == 32
    assert effective_chunk_size(90, 0, 193, True, "batched") == 34
    assert effective_chunk_size(16, 999, 25, True, "batched") == 25


def test_reconstruct_clamps_oversize_pallas_chunk(capsys):
    """An oversize chunk request on the Pallas batched path runs at the
    clamped size and matches an explicit run at that size."""
    ds16 = synthetic_dataset(np_size=16, grid=5, seed=3)
    # np_size=16 → cap=208; force a tiny artificial ceiling via a chunk
    # that exceeds K instead: chunk 999 → clamped to K=25 (single chunk).
    a = reconstruct(ds16.images, ds16.geom, ds16.cfg, iterations=2,
                    dtype="complex64", mode="batched", chunk_size=999,
                    use_pallas=True, dft_precision="highest",
                    collect_metrics=False)
    b = reconstruct(ds16.images, ds16.geom, ds16.cfg, iterations=2,
                    dtype="complex64", mode="batched", chunk_size=25,
                    use_pallas=True, dft_precision="highest",
                    collect_metrics=False)
    np.testing.assert_array_equal(a.obj_f_centered, b.obj_f_centered)


def test_fused_kernels_emit_per_sweep_metrics(ds):
    """VERDICT r3 item 5: both fused kernels accumulate per-sweep
    (data-residual, update-norm) in-kernel, matching the XLA paths."""
    # sequential kernel vs sequential XLA sweep
    ref = reconstruct(ds.images, ds.geom, ds.cfg, iterations=3,
                      dtype="complex64")
    seq = reconstruct(ds.images, ds.geom, ds.cfg, iterations=3,
                      dtype="complex64", use_pallas=True,
                      dft_precision="highest")
    assert seq.metrics["data_residual"].shape == (3,)
    np.testing.assert_allclose(seq.metrics["data_residual"],
                               ref.metrics["data_residual"], rtol=1e-4)
    np.testing.assert_allclose(seq.metrics["update_norm"],
                               ref.metrics["update_norm"], rtol=1e-4)
    # residual decreases over sweeps (sanity that it's a real curve)
    assert seq.metrics["data_residual"][-1] < seq.metrics["data_residual"][0]

    # chunked kernel vs batched XLA sweep (chunk 8 -> 4 chunks, 7 dummies)
    refb = reconstruct(ds.images, ds.geom, ds.cfg, iterations=3,
                       dtype="complex64", mode="batched", chunk_size=8)
    chk = reconstruct(ds.images, ds.geom, ds.cfg, iterations=3,
                      dtype="complex64", mode="batched", chunk_size=8,
                      use_pallas=True, dft_precision="highest")
    np.testing.assert_allclose(chk.metrics["data_residual"],
                               refb.metrics["data_residual"], rtol=1e-4)
    np.testing.assert_allclose(chk.metrics["update_norm"],
                               refb.metrics["update_norm"], rtol=1e-4)
