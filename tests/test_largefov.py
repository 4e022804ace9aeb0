"""Large-FOV tiling: reconstruct overlapping ROIs of a wide frame and stitch.

Hermetic physical test: a wide field is forward-simulated at full-frame size
F (the model is local), then reconstructed as an R×C grid of Np-sized ROIs
with overlap-feathered stitching. Windowed ROIs of a non-periodic scene make
this approximate by nature — thresholds are accordingly looser than the
single-ROI inverse-crime tests.
"""

import dataclasses

import numpy as np
import pytest

from fpm_tpu.data.simulate import synthetic_dataset
from fpm_tpu.geometry import compute_geometry
from fpm_tpu.models.largefov import _feather_weight, reconstruct_large_fov


@pytest.fixture(scope="module")
def wide():
    # Simulate the full 48-px frame in one shot (np_size=F=48).
    return synthetic_dataset(np_size=48, grid=5, seed=7)


def test_feather_weight():
    w = _feather_weight(12, 4)
    assert w.shape == (12, 12)
    assert w[6, 6] == 1.0
    assert w[0, 6] < 1.0 and np.all(w > 0)


def test_stitched_reconstruction(wide):
    # Reconstruct 3x3 tiles of Np=16 with 4-px overlap.
    cfg = dataclasses.replace(wide.cfg, np_size=16, crop_x=0, crop_y=0)
    geom = compute_geometry(cfg, coordinates=wide.cfg.hole_coordinates)
    res = reconstruct_large_fov(
        wide.images, geom, cfg, grid=(3, 3), overlap=4,
        iterations=20, dtype="complex128",
    )
    rif = cfg.res_improvement_factor
    assert rif == 3
    # Coverage: 16 + 12*2 = 40 camera px → 120 high-res px.
    assert res.stitched.shape == (120, 120)
    assert len(res.tiles) == 9

    truth = wide.object_true[: 40 * rif, : 40 * rif]
    a, t = np.abs(res.stitched), np.abs(truth)
    # Interior comparison (edge tiles suffer windowing).
    sl = np.s_[12:-12, 12:-12]
    a, t = a[sl], t[sl]
    s = (t * a).sum() / (a * a).sum()
    rmse = np.sqrt(((a * s - t) ** 2).mean()) / t.mean()
    assert rmse < 0.3, rmse


def test_grid_bounds_check(wide):
    cfg = dataclasses.replace(wide.cfg, np_size=16, crop_x=0, crop_y=0)
    geom = compute_geometry(cfg, coordinates=wide.cfg.hole_coordinates)
    with pytest.raises(ValueError, match="tile grid"):
        reconstruct_large_fov(wide.images, geom, cfg, grid=(9, 9), overlap=4)
