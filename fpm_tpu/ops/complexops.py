"""Complex-field primitives on native complex arrays.

Replaces the reference's cvComplex 2-channel-Mat emulation (SURVEY.md §1 L0;
profiled hot spots ``complexMultiply`` 24.1%, ``complexAbs`` 20.0%,
``complexDivide`` 13.3%, ``fftShift``/``circularShift`` 3.1% of runtime in
``output.svg``). With native complex dtypes all of those become single fused
XLA element-wise ops; only the structured data movement lives here.

Frame convention: the solver stores the large object spectrum **centered**
(DC in the middle) permanently, unlike the reference which stores it DC-at-
corner and performs two full-size ``fftShift`` passes per LED
(fpmMain.cpp:358-362, 427-447) — the dominant memory traffic of its hot loop.
Patch-size shifts between the centered and corner frames are cheap rolls.
All bundled configs have even Np/Nlarge, for which ``fftshift == ifftshift``
(the reference's floor-quadrant-swap ``fftShift`` equals both).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fftshift2d(x: jax.Array) -> jax.Array:
    """fftshift over the last two axes (corner frame → centered frame)."""
    return jnp.fft.fftshift(x, axes=(-2, -1))


def ifftshift2d(x: jax.Array) -> jax.Array:
    """ifftshift over the last two axes (centered frame → corner frame)."""
    return jnp.fft.ifftshift(x, axes=(-2, -1))


def crop_patch(spectrum: jax.Array, start_yx: jax.Array, size: int) -> jax.Array:
    """Dynamic ``size×size`` patch crop at (row, col) ``start_yx``.

    The reference's per-LED sub-aperture crop
    ``objF_centered(Rect(cropXStart, cropYStart, Np, Np))`` (fpmMain.cpp:361).
    ``start_yx`` may be traced (per-LED values inside a scan); ``size`` is
    static so shapes stay static under jit.
    """
    return jax.lax.dynamic_slice(spectrum, (start_yx[0], start_yx[1]), (size, size))


def paste_patch_add(spectrum: jax.Array, patch: jax.Array, start_yx: jax.Array) -> jax.Array:
    """Add ``patch`` into ``spectrum`` at (row, col) ``start_yx``.

    The reference's read-modify-write of the crop region
    (fpmMain.cpp:429-446), as a slice-add-update (no full-size copies).
    """
    size = patch.shape[-1]
    cur = jax.lax.dynamic_slice(spectrum, (start_yx[0], start_yx[1]), (size, size))
    return jax.lax.dynamic_update_slice(spectrum, cur + patch, (start_yx[0], start_yx[1]))
