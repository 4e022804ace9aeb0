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


def test_pallas_rejects_batched(ds):
    with pytest.raises(ValueError, match="sequential"):
        reconstruct(ds.images, ds.geom, ds.cfg, iterations=1, dtype="complex64",
                    use_pallas=True, mode="batched")
