"""Large-FOV reconstruction: real-space ROI tiling with overlap stitching.

The reference reconstructs a single Np×Np ROI of the camera frame
(``cropX/cropY``, fpmMain.cpp:124-125) — large fields of view are out of its
reach (one monolithic spectrum in RAM, SURVEY.md §5 "long-context" row).
Here the full frame is tiled into overlapping Np×Np ROIs, each reconstructed
independently (the FPM forward model is local, so ROIs share the same LED
geometry table), and the recovered high-res complex fields are stitched:

* per-tile global complex scale/phase is ambiguous, so each tile is
  least-squares phase-aligned to the already-stitched canvas over the
  overlap region before blending;
* blending uses a separable feathering ramp over the overlap.

ROIs are embarrassingly parallel — they reuse the single-device solver per
tile (optionally under different devices via the caller), and each tile can
itself run LED/tile-sharded.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..config import FPMConfig
from ..geometry import LEDGeometry
from .epry import ReconResult, reconstruct


@dataclasses.dataclass
class LargeFOVResult:
    stitched: np.ndarray          # (H_hr, W_hr) complex high-res field
    tiles: list[ReconResult]
    tile_origins: list[tuple[int, int]]  # high-res (row, col) of each tile


def _feather_weight(n: int, overlap: int) -> np.ndarray:
    """Separable 2-D blending weight: linear ramps across the overlap."""
    w = np.ones(n)
    ramp = np.linspace(1.0 / (overlap + 1), 1.0, overlap, endpoint=False)
    if overlap > 0:
        w[:overlap] = ramp
        w[-overlap:] = ramp[::-1]
    return np.outer(w, w)


def reconstruct_large_fov(
    full_images: np.ndarray,
    geom: LEDGeometry,
    cfg: FPMConfig,
    grid: tuple[int, int],
    overlap: int | None = None,
    iterations: int | None = None,
    dtype=None,
    progress=None,
    **opt_overrides,
) -> LargeFOVResult:
    """Tile the FOV into an R×C grid of overlapping ROIs and stitch.

    Args:
      full_images: (K, H, W) preprocessed full frames ordered like
        ``geom.led_numbers`` (bg-subtracted; see ``load_dataset(...,
        full_frames=True)``).
      grid: (rows, cols) of ROI tiles starting at (cfg.crop_y, cfg.crop_x).
      overlap: camera-pixel overlap between neighboring ROIs
        (default Np // 4).
    """
    np_sz = cfg.np_size
    rif = cfg.res_improvement_factor
    rows, cols = grid
    if overlap is None:
        overlap = np_sz // 4
    stride = np_sz - overlap
    if stride <= 0:
        raise ValueError(f"overlap {overlap} must be < Np {np_sz}")

    need_h = cfg.crop_y + np_sz + stride * (rows - 1)
    need_w = cfg.crop_x + np_sz + stride * (cols - 1)
    if need_h > full_images.shape[1] or need_w > full_images.shape[2]:
        raise ValueError(
            f"tile grid {grid} with Np={np_sz}, overlap={overlap} needs "
            f"{need_h}×{need_w} frames, got {full_images.shape[1:]} "
        )

    hr_size = np_sz * rif
    hr_stride = stride * rif
    canvas = np.zeros(
        (hr_size + hr_stride * (rows - 1), hr_size + hr_stride * (cols - 1)),
        dtype=np.complex128,
    )
    weight = np.zeros(canvas.shape, dtype=np.float64)
    feather = _feather_weight(hr_size, overlap * rif)

    tiles, origins = [], []
    for r in range(rows):
        for c in range(cols):
            y0 = cfg.crop_y + r * stride
            x0 = cfg.crop_x + c * stride
            roi = full_images[:, y0 : y0 + np_sz, x0 : x0 + np_sz]
            res = reconstruct(
                roi, geom, cfg, iterations=iterations, dtype=dtype, **opt_overrides
            )
            tiles.append(res)
            hy, hx = r * hr_stride, c * hr_stride
            origins.append((hy, hx))

            tile = res.obj_crop.astype(np.complex128)
            region = np.s_[hy : hy + hr_size, hx : hx + hr_size]
            seen = weight[region] > 0
            if seen.any():
                # Least-squares complex scale aligning this tile to the
                # already-stitched canvas over the overlap.
                existing = canvas[region][seen] / weight[region][seen]
                t_vals = tile[seen]
                denom = np.vdot(t_vals, t_vals).real
                s = np.vdot(t_vals, existing) / denom if denom > 0 else 1.0
            else:
                s = 1.0
            canvas[region] += feather * (s * tile)
            weight[region] += feather
            if progress is not None:
                progress(r, c, res)

    stitched = canvas / np.maximum(weight, 1e-12)
    return LargeFOVResult(stitched=stitched, tiles=tiles, tile_origins=origins)
