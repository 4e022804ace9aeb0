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
