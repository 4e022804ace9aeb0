"""Ingestion tests: filename parsing, decode, preprocess, bg subtraction.

Hermetic: synthetic TIFF frames are written with PIL in the reference's
``{prefix}{led#}{ext}`` layout, with known background offsets, and the loader
output is checked against hand-computed preprocessing (fpmMain.cpp:109-144).
"""

import os

import numpy as np
import pytest
from PIL import Image

from fpm_tpu.config import FPMConfig
from fpm_tpu.data.loader import load_dataset, preprocess_image, scan_directory


def _write_frame(path, full_shape, roi, roi_value, bg_value):
    img = np.full(full_shape, bg_value, dtype=np.uint16)
    y, x, n = roi
    img[y : y + n, x : x + n] = roi_value
    Image.fromarray(img).save(path)
    return img


@pytest.fixture
def tiny_dataset(tmp_path):
    n = 8
    coords = np.array([[0.0, 0.0, 50.0], [3.0, 0.0, 50.0], [0.0, 3.0, 50.0]])
    cfg = FPMConfig(
        dataset_root=str(tmp_path) + os.sep,
        file_prefix="iLED_",
        file_extension=".tif",
        np_size=n,
        crop_x=4, crop_y=2,
        bk1_crop_x=20, bk1_crop_y=20, bk2_crop_x=20, bk2_crop_y=2,
        bg_threshold=120.0,
        pixel_size=1.0, objective_mag=1.0,
        objective_na=0.3, max_illumination_na=0.5, wavelength=0.5,
        led_count=3, hole_coordinates=coords,
    )
    for led, (val, bg) in enumerate([(1000, 100), (2000, 50), (900, 300)], start=1):
        _write_frame(tmp_path / f"iLED_{led}.tif", (32, 32), (2, 4, n), val, bg)
    # distractor files that must be ignored
    (tmp_path / "iLED_7.txt").write_text("no")
    (tmp_path / "other_1.tif").write_bytes(b"")
    return cfg


def test_scan_directory(tiny_dataset):
    found = scan_directory(tiny_dataset)
    assert [n for n, _ in found] == [1, 2, 3]


def test_load_and_background_subtraction(tiny_dataset):
    ds = load_dataset(tiny_dataset, use_native=False)
    assert ds.images.shape == (3, 8, 8)
    assert ds.images.dtype == np.uint16
    # LED1: uniform bg 100 (< threshold 120): ROI 1000 - 100 = 900
    assert ds.bg_values[0] == 100
    assert np.all(ds.images[0] == 900)
    # LED2: bg 50 → 2000-50
    assert ds.bg_values[1] == 50 and np.all(ds.images[1] == 1950)
    # LED3: bg 300 clamped at threshold 120 → 900-120 (fpmMain.cpp:137-138)
    assert ds.bg_values[2] == 120 and np.all(ds.images[2] == 780)


def test_saturating_subtract():
    # 32767 = the int16 ceiling the config now enforces (fpmMain.h:34
    # stores bg_val as int16_t) — effectively "no clamp" for this data
    cfg = FPMConfig(np_size=4, crop_x=0, crop_y=0,
                    bk1_crop_x=0, bk1_crop_y=0, bk2_crop_x=0, bk2_crop_y=0,
                    bg_threshold=32767)
    full = np.full((4, 4), 10, dtype=np.uint16)
    img, bg = preprocess_image(full, cfg, is_darkfield=False)
    # bg estimate = 10 (the ROI itself) → 10-10=0, no wraparound
    assert bg == 10 and np.all(img == 0)


def test_darkfield_divide():
    cfg = FPMConfig(np_size=4, crop_x=0, crop_y=0,
                    bk1_crop_x=0, bk1_crop_y=0, bk2_crop_x=0, bk2_crop_y=0,
                    bg_threshold=0.0, darkfield_exp_multiplier=4)
    full = np.full((4, 4), 1002, dtype=np.uint16)
    img, bg = preprocess_image(full, cfg, is_darkfield=True)
    # 1002/4 = 250.5 → round-half-even 250; bg clamped to 0 → 250
    assert np.all(img == 250)
    img_bf, _ = preprocess_image(full, cfg, is_darkfield=False)
    assert np.all(img_bf == 1002)  # brightfield frames are not divided


def test_color_channel_selection(tmp_path):
    n = 4
    rgb = np.zeros((16, 16, 3), dtype=np.uint8)
    rgb[..., 0] = 50   # R
    rgb[..., 1] = 100  # G
    rgb[..., 2] = 150  # B
    Image.fromarray(rgb).save(tmp_path / "iLED_1.tif")
    cfg = FPMConfig(
        dataset_root=str(tmp_path) + os.sep, np_size=n, crop_x=0, crop_y=0,
        bk1_crop_x=8, bk1_crop_y=8, bk2_crop_x=8, bk2_crop_y=8,
        bg_threshold=0.0, color=True, led_count=1,
        hole_coordinates=np.array([[0.0, 0.0, 50.0]]),
        max_illumination_na=0.5,
    )
    ds = load_dataset(cfg, use_native=False)
    # Default colorChannel=2 in BGR = red (fpmMain.cpp:115, quirk 3) → 50
    assert np.all(ds.images[0] == 50)


def test_loader_rejects_zero_and_duplicate_led_numbers(tmp_path):
    """Round-5 review hardening: a 0-numbered file would silently wrap to
    the LAST coordinate row (coords[led-1]); duplicate numbers (padded and
    unpadded names) would silently drop one file and double-weight the
    other. Both are clean errors now."""
    import pytest
    from PIL import Image

    from fpm_tpu.data.loader import load_dataset

    def cfg_for(d):
        coords = np.array([[0.0, 0.0, 50.0]] * 9)
        return FPMConfig(dataset_root=str(d) + os.sep, np_size=4,
                         crop_x=0, crop_y=0, bk1_crop_x=0, bk1_crop_y=0,
                         bk2_crop_x=0, bk2_crop_y=0, bg_threshold=0,
                         led_count=9, hole_coordinates=coords)

    img = np.full((8, 8), 100, dtype=np.uint16)
    d0 = tmp_path / "zero"
    d0.mkdir()
    Image.fromarray(img).save(d0 / "iLED_0.tif")
    with pytest.raises(ValueError, match="not 1-based"):
        load_dataset(cfg_for(d0), use_native=False)

    dd = tmp_path / "dup"
    dd.mkdir()
    Image.fromarray(img).save(dd / "iLED_7.tif")
    Image.fromarray(img).save(dd / "iLED_007.tif")
    with pytest.raises(ValueError, match="duplicate"):
        load_dataset(cfg_for(dd), use_native=False)


def test_config_rejects_odd_np_and_oversized_bgthresh():
    import pytest

    with pytest.raises(ValueError, match="must be even"):
        FPMConfig(np_size=15)
    with pytest.raises(ValueError, match="int16"):
        FPMConfig(bg_threshold=40000)
