"""LED-geometry unit tests against a literal scalar re-derivation of the C++.

The vectorized pipeline (fpm_tpu.geometry) is checked per-LED against a
direct transliteration of the reference math (fpmMain.cpp:59-61, 77-168) on
the dome table, plus edge-case tests for rounding, flips, and the schedule.
"""

import math

import numpy as np
import pytest

from fpm_tpu.config import FPMConfig
from fpm_tpu.geometry import (
    _c_round,
    compute_geometry,
    pupil_radius,
    pupil_support,
    rotation_matrix_z,
)


def scalar_reference_geometry(cfg, coords, led_num):
    """Per-LED transliteration of fpmMain.cpp:59-61,77-168 (test oracle)."""
    angle = cfg.array_rotation
    a = math.radians(angle)
    R = [[math.cos(a), -math.sin(a), 0], [math.sin(a), math.cos(a), 0], [0, 0, 1]]
    x, y, z = coords[led_num - 1]
    # row-vector times matrix (fpmMain.cpp:85)
    rx = x * R[0][0] + y * R[1][0] + z * R[2][0]
    ry = x * R[0][1] + y * R[1][1] + z * R[2][1]
    rz = x * R[0][2] + y * R[1][2] + z * R[2][2]
    if cfg.flip_illumination_x:
        rx = -rx
    if cfg.flip_illumination_y:
        ry = -ry
    sx = math.sin(math.atan2(rx, rz))
    sy = math.sin(math.atan2(ry, rz))
    na = math.sqrt(sx * sx + sy * sy)
    u, v = sx / cfg.wavelength, sy / cfg.wavelength
    idx_u = int(round(u / cfg.du))  # python round is banker's; adjust below
    idx_u = int(math.copysign(math.floor(abs(u / cfg.du) + 0.5), u / cfg.du))
    idx_v = int(math.copysign(math.floor(abs(v / cfg.du) + 0.5), v / cfg.du))
    crop_x = cfg.n_large // 2 + idx_u - cfg.np_size // 2
    crop_y = cfg.n_large // 2 + idx_v - cfg.np_size // 2
    return sx, sy, na, idx_u, idx_v, crop_x, crop_y


def test_geometry_matches_scalar_reference_on_dome():
    cfg = FPMConfig(max_illumination_na=0.45)  # mono-style optics
    coords = cfg.coordinates()
    geom = compute_geometry(cfg)
    assert geom.num_leds > 0
    for i in range(0, geom.num_leds, 7):
        led = int(geom.led_numbers[i])
        sx, sy, na, iu, iv, cx, cy = scalar_reference_geometry(cfg, coords, led)
        assert geom.sin_theta[i, 0] == pytest.approx(sx, rel=1e-12)
        assert geom.sin_theta[i, 1] == pytest.approx(sy, rel=1e-12)
        assert geom.illumination_na[i] == pytest.approx(na, rel=1e-12)
        assert geom.idx_uv[i, 0] == iu and geom.idx_uv[i, 1] == iv
        assert geom.crop_start[i, 0] == cy and geom.crop_start[i, 1] == cx


def test_na_filter():
    cfg = FPMConfig(max_illumination_na=0.45)
    geom = compute_geometry(cfg)
    assert np.all(geom.illumination_na.astype(np.float32) < np.float32(0.45))
    # dome has 508 LEDs; the high-NA ring must be filtered out
    assert geom.num_leds < 508


def test_schedule_ascending_na():
    cfg = FPMConfig(max_illumination_na=0.45)
    geom = compute_geometry(cfg)
    na_sorted = geom.illumination_na[geom.schedule]
    assert np.all(np.diff(na_sorted.astype(np.float32)) >= 0)


def test_c_round_half_away_from_zero():
    np.testing.assert_array_equal(
        _c_round(np.array([0.5, -0.5, 1.5, -1.5, 2.4, -2.4])),
        [1, -1, 2, -2, 2, -2],
    )


def test_rotation_matrix_row_vector_convention():
    # 90° rotation: reference computes coords @ R with R as written
    # (fpmMain.cpp:61,85): (1,0,0) @ R = (cos, -sin, 0) = (0, -1, 0).
    R = rotation_matrix_z(90.0)
    out = np.array([1.0, 0.0, 0.0]) @ R
    np.testing.assert_allclose(out, [0.0, -1.0, 0.0], atol=1e-12)


def test_flip_quirk_overwrite_vs_compose():
    cfg = FPMConfig(flip_illumination_x=True, flip_illumination_y=True,
                    max_illumination_na=0.45)
    g_strict = compute_geometry(cfg, strict_reference_flips=True)
    g_fixed = compute_geometry(cfg, strict_reference_flips=False)
    # strict: Y-flip overwrites X-flip (fpmMain.cpp:88-93) → sinθ_x unflipped
    cfg0 = FPMConfig(max_illumination_na=0.45)
    g0 = compute_geometry(cfg0)
    np.testing.assert_allclose(g_strict.sin_theta[:, 0], g0.sin_theta[:, 0])
    np.testing.assert_allclose(g_strict.sin_theta[:, 1], -g0.sin_theta[:, 1])
    np.testing.assert_allclose(g_fixed.sin_theta[:, 0], -g0.sin_theta[:, 0])
    np.testing.assert_allclose(g_fixed.sin_theta[:, 1], -g0.sin_theta[:, 1])


def test_pupil_support_radius_and_frame():
    cfg = FPMConfig(np_size=90)
    r = pupil_radius(cfg)
    # ceil(0.2 * 0.8125 * 90 / 0.5) = ceil(29.25) = 30 (fpmMain.cpp:305-306)
    assert r == 30
    sup_c = pupil_support(cfg, centered=True)
    assert sup_c[45, 45] == 1.0
    assert sup_c[45, 45 + r] == 1.0
    assert sup_c[45, 45 + r + 1] == 0.0
    sup = pupil_support(cfg, centered=False)
    assert sup[0, 0] == 1.0  # DC at corner after fftshift
    np.testing.assert_array_equal(np.fft.ifftshift(sup_c), sup)


def test_crop_bounds_always_inside_spectrum():
    # The resImprovementFactor formula (fpmMain.cpp:556-558) guarantees that
    # every NA-filtered LED's sub-aperture fits inside the large spectrum;
    # verify the property on the full dome at the default (widest) maxNA.
    cfg = FPMConfig()  # maxIlluminationNA=0.7604 — the dome's full range
    geom = compute_geometry(cfg)
    assert geom.num_leds > 400
    assert geom.crop_start.min() >= 0
    assert (geom.crop_start + cfg.np_size).max() <= cfg.n_large
