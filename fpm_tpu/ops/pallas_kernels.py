"""Pallas TPU kernels: the fused EPRY sweep (SURVEY.md N4).

The reference's hot loop spends ~60% of its time in unfused element-wise
complex arithmetic and reductions and allocates ~97k temporaries per run
(BASELINE.md); its per-LED step is a dozen separate OpenCV ops with a
host↔device round trip (fpmMain.cpp:348-476). Here the *entire sweep* is one
``pallas_call``:

* grid = (K,) — TPU grid steps run sequentially on the core, which is
  exactly the Gauss–Seidel LED ordering; the measured-amplitude block for
  LED k+1 is DMA'd from HBM while LED k computes (automatic block
  pipelining).
* The large object spectrum (real/imag float32 planes, lane-padded to 128)
  stays **resident in VMEM** for the whole sweep via input/output aliasing —
  zero HBM traffic for the spectrum between LEDs (Nlarge=600 → ~3 MB of
  16 MB VMEM; spectra beyond VMEM take the tile-sharded path instead).
* All per-LED math happens in the **centered patch frame**: for even N the
  reference's four patch fftshifts per LED (fpmMain.cpp:358-362,432) fold
  into the DFT matrices as row/column permutations precomputed on the host
  (``fftshift(fft2(y)) = (S F) y (F S)`` with S the half-roll permutation),
  so the kernel contains no per-LED shifts at all — and the 2D FFT/IFFT run
  on the **MXU** as complex DFT matmuls (4 real matmuls each).
* Dynamic patch windows: Mosaic needs 8-aligned sublane offsets and
  8×128-aligned shapes for vector ops, so reads slice an aligned
  (W, lanes)-window and rotate the residual (row, lane) offset in with
  dynamic ``pltpu.roll``; writes build an aligned delta block and rotate it
  out. W = Np+8 rounded up to 8; the spectrum is padded accordingly.
* The per-LED global ``max|O|`` (the reference's full-spectrum
  ``cv::minMaxLoc``, fpmMain.cpp:467) is a VPU reduction over the
  VMEM-resident spectrum — exact semantics at on-chip bandwidth.

The pupil lives in the centered frame inside the kernel; the wrapper
converts from/to the solver's DC-at-corner convention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fft import _dft_matrix_np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=16)
def _shifted_dft_mats(n: int):
    """Host-precomputed DFT matrices with the fftshift permutations folded in.

    For even n the half-roll permutation S satisfies S = Sᵀ = S⁻¹, so
      fftshift(fft2(y))     = (S·F) y (F·S)      — forward, centered output
      ifft2(ifftshift(X))   = (F⁻¹·S) X (S·F⁻¹)  — centered input
    Returned as float32 real/imag plane pairs (af, bf, ai, bi).
    """
    h = n // 2
    fwd = _dft_matrix_np(n, False, "complex64")
    inv = _dft_matrix_np(n, True, "complex64")
    af = np.roll(fwd, -h, axis=0)   # S @ F
    bf = np.roll(fwd, -h, axis=1)   # F @ S
    ai = np.roll(inv, -h, axis=1)   # F⁻¹ @ S
    bi = np.roll(inv, -h, axis=0)   # S @ F⁻¹
    out = []
    for m in (af, bf, ai, bi):
        out.append(np.ascontiguousarray(m.real, np.float32))
        out.append(np.ascontiguousarray(m.imag, np.float32))
    return tuple(out)


def _bf16_split(x):
    """f32 → (hi, lo) bf16 pair with hi + lo ≈ x to ~16 mantissa bits."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a, b):
    """a @ b via the 3-pass bf16 split product (error ~2⁻¹⁸ per element).

    TPU matmul precision tiers: single-pass bf16 (DEFAULT) has ~1e-2
    relative error — far too coarse for the DFT inside an iterative
    phase-retrieval loop; Precision.HIGHEST is exact f32 but runs 6 bf16
    passes. The 3-pass split (ah·bh + ah·bl + al·bh, dropping the ~2⁻¹⁸
    al·bl term, f32 accumulation) measures 2.3e-6 relative error on the
    full reconstruction after 10 sweeps — below the c64 round-off the
    solver already carries — at twice the MXU throughput of HIGHEST.
    (Mosaic has no Precision.HIGH; the Gauss 3-multiplication trick was
    also measured: no faster, 7× worse error.)
    """
    ah, al = _bf16_split(a)
    bh, bl = _bf16_split(b)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    return dot(ah, bh) + dot(ah, bl) + dot(al, bh)


def _dot_exact(a, b):
    return jnp.dot(
        a, b,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _cmatmul(ar, ai, br, bi, dot):
    """(ar+i·ai) @ (br+i·bi) as four real MXU matmuls."""
    rr = dot(ar, br) - dot(ai, bi)
    ri = dot(ar, bi) + dot(ai, br)
    return rr, ri


def _dft2(zr, zi, a_r, a_i, b_r, b_i, dot):
    """A @ z @ B on complex planes (two complex matmuls)."""
    tr, ti = _cmatmul(a_r, a_i, zr, zi, dot)
    return _cmatmul(tr, ti, b_r, b_i, dot)


def _read_window(o_ref, plane, ys0, dy, xs, n, w):
    """Read the (n, n) window at dynamic offset (ys0+dy, xs).

    Slices an (w, full-lane) block at the 8-aligned row ``ys0``, rotates the
    residual offsets in with dynamic rolls (legal on the 8×128-aligned block
    shape), then takes the static corner.
    """
    blk = o_ref[plane, pl.ds(pl.multiple_of(ys0, 8), w), :]
    # Positive modular shifts only: dynamic pltpu.roll with negative shifts
    # miscompiles on TPU (verified empirically — wrong data, no error).
    lanes = blk.shape[1]
    blk = pltpu.roll(pltpu.roll(blk, w - dy, 0), lanes - xs, 1)
    return blk[0:n, 0:n]


def _add_window(o_ref, plane, ys0, dy, xs, delta, n, w, lanes):
    """Add an (n, n) delta into the plane at dynamic offset (ys0+dy, xs)."""
    blk = jnp.pad(delta, ((0, w - n), (0, lanes - n)))
    blk = pltpu.roll(pltpu.roll(blk, dy, 0), xs, 1)
    cur = o_ref[plane, pl.ds(pl.multiple_of(ys0, 8), w), :]
    o_ref[plane, pl.ds(pl.multiple_of(ys0, 8), w), :] = cur + blk


def _sweep_kernel(
    # scalar prefetch
    starts_ref,
    # inputs
    amp_ref, sup_ref,
    af_r, af_i, bf_r, bf_i, ai_r, ai_i, bi_r, bi_i,
    o_in_ref, p_in_ref,
    # outputs (aliased)
    o_ref, p_ref,
    *, np_size: int, win: int, lanes: int,
    delta1: float, delta2: float, eps: float, dft_precision: str,
):
    k = pl.program_id(0)
    n = np_size
    dot = _dot3 if dft_precision == "bf16x3" else _dot_exact

    ys = starts_ref[2 * k]
    xs = starts_ref[2 * k + 1]
    ys0 = (ys // 8) * 8
    dy = ys - ys0

    # --- centered sub-spectrum patch (fpmMain.cpp:358-362, shift-free here)
    oc_r = _read_window(o_ref, 0, ys0, dy, xs, n, win)
    oc_i = _read_window(o_ref, 1, ys0, dy, xs, n, win)

    # --- apply (centered) pupil (fpmMain.cpp:364)
    p_r = p_ref[0]
    p_i = p_ref[1]
    ocp_r = oc_r * p_r - oc_i * p_i
    ocp_i = oc_r * p_i + oc_i * p_r

    # --- to image plane: IFFT∘ifftshift folded into the matrices
    img_r, img_i = _dft2(ocp_r, ocp_i, ai_r[...], ai_i[...], bi_r[...], bi_i[...], dot)

    # --- amplitude replacement preserving phase (fpmMain.cpp:377-394);
    #     eps on the real part only, as the reference's scalar cv::add.
    amp = amp_ref[0]
    mag = jnp.sqrt((img_r + eps) ** 2 + img_i**2)
    scale = amp / mag
    rep_r = img_r * scale
    rep_i = img_i * scale

    # --- back to the centered Fourier frame: fftshift∘FFT folded in
    up_r, up_i = _dft2(rep_r, rep_i, af_r[...], af_i[...], bf_r[...], bf_i[...], dot)
    d_r = up_r - ocp_r
    d_i = up_i - ocp_i

    # --- object update (fpmMain.cpp:404-447):
    #     ΔO = diff · |P| · conj(P) / (max|P| · (|P|² + delta2))
    pabs2 = p_r * p_r + p_i * p_i
    pabs = jnp.sqrt(pabs2)
    pmax = jnp.sqrt(jnp.max(pabs2))
    denom_o = pmax * (pabs2 + delta2)
    wr = pabs * p_r / denom_o
    wi = -pabs * p_i / denom_o
    do_r = d_r * wr - d_i * wi
    do_i = d_r * wi + d_i * wr
    _add_window(o_ref, 0, ys0, dy, xs, do_r, n, win, lanes)
    _add_window(o_ref, 1, ys0, dy, xs, do_i, n, win, lanes)

    # --- global max|O| over the *updated* VMEM-resident spectrum
    #     (fpmMain.cpp:460,467: minMaxLoc over the full objF)
    omax = jnp.sqrt(jnp.max(o_ref[0] ** 2 + o_ref[1] ** 2))

    # --- EPRY pupil update (fpmMain.cpp:457-475):
    #     ΔP = diff · |Oc| · conj(Oc) / (max|O| · (|Oc|² + delta1)) · support
    oabs2 = oc_r * oc_r + oc_i * oc_i
    oabs = jnp.sqrt(oabs2)
    denom_p = omax * (oabs2 + delta1)
    sup = sup_ref[...]
    vr = oabs * oc_r / denom_p * sup
    vi = -oabs * oc_i / denom_p * sup
    p_ref[0] = p_r + (d_r * vr - d_i * vi)
    p_ref[1] = p_i + (d_r * vi + d_i * vr)


@functools.partial(
    jax.jit,
    static_argnames=(
        "np_size", "n_large", "delta1", "delta2", "eps", "interpret",
        "dft_precision",
    ),
)
def fused_epry_sweep(
    o_planes,       # (2, Nlarge, Nlarge) f32, centered frame
    p_planes,       # (2, Np, Np) f32, DC-at-corner frame (solver convention)
    support,        # (Np, Np) f32, DC-at-corner frame
    amps,           # (K, Np, Np) f32, schedule order
    starts_flat,    # (2K,) int32: [y0, x0, y1, x1, ...]
    *,
    np_size: int,
    n_large: int,
    delta1: float,
    delta2: float,
    eps: float,
    interpret: bool = False,
    dft_precision: str = "bf16x3",
):
    """One full sequential EPRY sweep as a single fused Pallas kernel.

    Numerically equivalent to ``models.epry.sweep_sequential`` with
    ``global_max='exact'`` (validated in tests; ``dft_precision='highest'``
    matches to f32 round-off, the default ``'bf16x3'`` to ~1e-6 relative —
    see :func:`_dot3` — at ~1.3× the sweep throughput).
    """
    if dft_precision not in ("bf16x3", "highest"):
        raise ValueError(
            f"dft_precision must be 'bf16x3' or 'highest', got {dft_precision!r}"
        )
    k = amps.shape[0]
    n = np_size
    win = _round_up(n + 8, 8)
    lanes = _round_up(n_large, 128)
    pad_rows = win - n  # ys0 ≤ Nlarge - Np ⇒ ys0 + win ≤ Nlarge + pad_rows
    f32 = jnp.float32

    mats = [jnp.asarray(m) for m in _shifted_dft_mats(n)]

    # Kernel-side pupil/support live in the centered frame.
    p_centered = jnp.roll(p_planes, (n // 2, n // 2), axis=(1, 2))
    sup_centered = jnp.roll(support, (n // 2, n // 2), axis=(0, 1))

    o_padded = jnp.pad(o_planes, ((0, 0), (0, pad_rows), (0, lanes - n_large)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda i, s: (i, 0, 0)),  # amps per-LED block
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,  # sup, 8 DFT mats, o, p
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )

    kernel = functools.partial(
        _sweep_kernel, np_size=n, win=win, lanes=lanes,
        delta1=delta1, delta2=delta2, eps=eps, dft_precision=dft_precision,
    )
    o_out, p_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((2, n_large + pad_rows, lanes), f32),
            jax.ShapeDtypeStruct((2, n, n), f32),
        ),
        input_output_aliases={11: 0, 12: 1},  # o_in→o_out, p_in→p_out
        interpret=interpret,
    )(starts_flat, amps, sup_centered, *mats, o_padded, p_centered)

    # Back to solver conventions: trim padding, pupil to corner frame.
    p_corner = jnp.roll(p_out, (-(n // 2), -(n // 2)), axis=(1, 2))
    return o_out[:, :n_large, :n_large], p_corner
