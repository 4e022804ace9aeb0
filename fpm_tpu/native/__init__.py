"""Native C++ runtime: multithreaded image decode + preprocess.

The reference's ingestion is native C++ (OpenCV ``imread`` + libtiff, ~12% of
its runtime, BASELINE.md); this package holds the TPU-build equivalent — a
small C++ shared library (``fpm_io.cpp``) that decodes TIFF stacks and runs
the crop/darkfield/background-subtract pipeline in parallel threads, bound
via ctypes. Build with ``make -C fpm_tpu/native`` (or ``python -m
fpm_tpu.native.build``). Falls back to the pure-Python loader when absent.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "libfpm_io.so")


def _load() -> ctypes.CDLL | None:
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB_TRIED = True
        path = _lib_path()
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            try:
                abi = lib.fpm_abi_version()
            except AttributeError:
                abi = 1
            if abi != 4:
                import warnings

                warnings.warn(
                    f"stale native library (ABI {abi}, need 4) at {path}; "
                    "rebuild with make -C fpm_tpu/native — using the Python "
                    "loader", stacklevel=2,
                )
                return None
            lib.fpm_load_stack.restype = ctypes.c_int
            lib.fpm_load_stack.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),  # paths
                ctypes.c_int,                     # n images
                ctypes.c_int, ctypes.c_int,       # crop_x, crop_y
                ctypes.c_int,                     # np_size
                ctypes.c_int, ctypes.c_int,       # bk1 x, y
                ctypes.c_int, ctypes.c_int,       # bk2 x, y
                ctypes.c_double,                  # bg_threshold
                ctypes.c_int,                     # darkfield multiplier
                ctypes.POINTER(ctypes.c_uint8),   # is_darkfield flags
                ctypes.c_int,                     # color channel (BGR idx; -1 = gray)
                ctypes.c_int,                     # num threads (0 = auto)
                ctypes.POINTER(ctypes.c_uint16),  # out images (n, np, np)
                ctypes.POINTER(ctypes.c_int16),   # out bg values (n,)
                ctypes.POINTER(ctypes.c_uint8),   # out per-image status
            ]
            lib.fpm_load_frames.restype = ctypes.c_int
            lib.fpm_load_frames.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),  # paths
                ctypes.c_int,                     # n images
                ctypes.c_int, ctypes.c_int,       # frame_w, frame_h
                ctypes.c_int,                     # np_size (bg windows)
                ctypes.c_int, ctypes.c_int,       # bk1 x, y
                ctypes.c_int, ctypes.c_int,       # bk2 x, y
                ctypes.c_double,                  # bg_threshold
                ctypes.c_int,                     # darkfield multiplier
                ctypes.POINTER(ctypes.c_uint8),   # is_darkfield flags
                ctypes.c_int,                     # color channel (BGR idx; -1 = gray)
                ctypes.c_int,                     # num threads (0 = auto)
                ctypes.POINTER(ctypes.c_uint16),  # out frames (n, h, w)
                ctypes.POINTER(ctypes.c_int16),   # out bg values (n,)
                ctypes.POINTER(ctypes.c_uint8),   # out per-image status
            ]
            _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def load_and_preprocess(paths, cfg, is_darkfield, num_threads: int = 0):
    """Decode + preprocess a list of image paths via the C++ library.

    Returns (images, bgs, status): ``status[i] != 0`` marks files the native
    decoder rejected (compressed/tiled TIFF, other formats) — the caller
    re-decodes those through the Python path instead of failing the stack.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built; run make -C fpm_tpu/native")
    n = len(paths)
    np_sz = cfg.np_size
    images = np.empty((n, np_sz, np_sz), dtype=np.uint16)
    bgs = np.empty(n, dtype=np.int16)
    status = np.empty(n, dtype=np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    df = np.ascontiguousarray(np.asarray(is_darkfield), dtype=np.uint8)
    lib.fpm_load_stack(
        c_paths, n,
        cfg.crop_x, cfg.crop_y, np_sz,
        cfg.bk1_crop_x, cfg.bk1_crop_y, cfg.bk2_crop_x, cfg.bk2_crop_y,
        float(cfg.bg_threshold), int(cfg.darkfield_exp_multiplier),
        df.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        (cfg.color_channel if cfg.color else -1),
        num_threads,
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        bgs.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return images, bgs, status


def load_and_preprocess_rgb(paths, cfg, is_darkfield, num_threads: int = 0):
    """RGB decode-once: one decode per file, all 3 channels preprocessed.

    Returns (images (n, 3, np, np) in RGB plane order, bgs (n, 3),
    status (n,)). Each plane is bit-identical to running
    :func:`load_and_preprocess` with that single channel configured — the
    background estimate is computed per channel from that channel's full
    frame — but every TIFF is read and parsed exactly once instead of three
    times (the reference's ingest was ~12% of its runtime, BASELINE.md; the
    naive RGB loop pays it three times over).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built; run make -C fpm_tpu/native")
    n = len(paths)
    np_sz = cfg.np_size
    images = np.empty((n, 3, np_sz, np_sz), dtype=np.uint16)
    bgs = np.empty((n, 3), dtype=np.int16)
    status = np.empty(n, dtype=np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    df = np.ascontiguousarray(np.asarray(is_darkfield), dtype=np.uint8)
    lib.fpm_load_stack(
        c_paths, n,
        cfg.crop_x, cfg.crop_y, np_sz,
        cfg.bk1_crop_x, cfg.bk1_crop_y, cfg.bk2_crop_x, cfg.bk2_crop_y,
        float(cfg.bg_threshold), int(cfg.darkfield_exp_multiplier),
        df.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        -2,  # all-channels mode (ABI v4)
        num_threads,
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        bgs.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return images, bgs, status


def load_frames(paths, cfg, is_darkfield, frame_shape, num_threads: int = 0):
    """Decode + preprocess FULL camera frames (no ROI crop) natively.

    The large-FOV ingest path (models/largefov.py): same darkfield and
    background-subtract semantics as :func:`load_and_preprocess`, frames
    kept whole for later overlapping-ROI cropping. ``frame_shape`` is the
    expected (H, W); files of any other size (or unsupported encodings)
    are flagged in ``status`` for the caller's per-file Python fallback.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built; run make -C fpm_tpu/native")
    n = len(paths)
    h, w = int(frame_shape[0]), int(frame_shape[1])
    frames = np.empty((n, h, w), dtype=np.uint16)
    bgs = np.empty(n, dtype=np.int16)
    status = np.empty(n, dtype=np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    df = np.ascontiguousarray(np.asarray(is_darkfield), dtype=np.uint8)
    lib.fpm_load_frames(
        c_paths, n, w, h, cfg.np_size,
        cfg.bk1_crop_x, cfg.bk1_crop_y, cfg.bk2_crop_x, cfg.bk2_crop_y,
        float(cfg.bg_threshold), int(cfg.darkfield_exp_multiplier),
        df.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        (cfg.color_channel if cfg.color else -1),
        num_threads,
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        bgs.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return frames, bgs, status
