"""Synthetic end-to-end reconstruction accuracy (SURVEY.md §4.2).

Forward-simulate LED stacks from a known complex object (+ aberrated pupil),
reconstruct, and assert amplitude/phase RMSE against ground truth. This
replaces the sample data the reference never shipped.
"""

import numpy as np
import pytest

from fpm_tpu.data.simulate import synthetic_dataset
from fpm_tpu.models.epry import reconstruct
from fpm_tpu.utils.metrics import complex_field_rmse


def _amp_rmse(recon, truth):
    a, t = np.abs(recon), np.abs(truth)
    s = (t * a).sum() / (a * a).sum()
    return np.sqrt(((a * s - t) ** 2).mean()) / t.mean()


def test_sequential_reconstruction_converges():
    ds = synthetic_dataset(np_size=16, grid=5, seed=0)
    res = reconstruct(ds.images, ds.geom, ds.cfg, iterations=20, dtype="complex128")
    assert _amp_rmse(res.obj_crop, ds.object_true) < 0.05


def test_batched_mode_converges():
    ds = synthetic_dataset(np_size=16, grid=5, seed=0)
    res = reconstruct(
        ds.images, ds.geom, ds.cfg, iterations=25, dtype="complex128", mode="batched"
    )
    assert _amp_rmse(res.obj_crop, ds.object_true) < 0.08


def test_quantized_uint16_data():
    """16-bit quantized frames (the reference's TIFF depth) still converge."""
    ds = synthetic_dataset(np_size=16, grid=5, seed=2, quantize=True)
    res = reconstruct(ds.images, ds.geom, ds.cfg, iterations=20, dtype="complex128")
    assert _amp_rmse(res.obj_crop, ds.object_true) < 0.08


def test_pupil_recovery_with_aberration():
    """EPRY must recover a defocus-aberrated pupil's phase, not just the object."""
    ds = synthetic_dataset(np_size=16, grid=5, seed=3, aberrated_pupil=True,
                           iterations=40)
    res = reconstruct(ds.images, ds.geom, ds.cfg, iterations=40, dtype="complex128")
    sup = np.abs(ds.pupil_true) > 0
    # Compare recovered vs true pupil phase inside the support (up to a
    # global phase constant — remove via the support mean).
    ph_t = np.angle(ds.pupil_true[sup])
    ph_r = np.angle(res.pupil[sup])
    d = ph_r - ph_t
    d = d - d.mean()
    aberration_scale = np.std(ph_t)
    assert np.std(d) < 0.5 * aberration_scale
    # And the object should be better than with an unrecovered pupil.
    assert _amp_rmse(res.obj_crop, ds.object_true) < 0.1


def test_complex_field_rmse_metric():
    x = np.random.default_rng(0).standard_normal((8, 8)) + 1j
    assert complex_field_rmse(x, x) < 1e-12
    assert complex_field_rmse(3.3j * x, x) < 1e-12  # scale/phase aligned
    assert complex_field_rmse(x, -x + 1) > 0.1
