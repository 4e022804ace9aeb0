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
  on the **MXU** as complex DFT matmuls.
* **Pupil-support bounding box**: the pupil is an NA-limited disk
  (fpmMain.cpp:304-310), and by induction it stays exactly zero outside its
  support (the EPRY increment is masked by the support, fpmMain.cpp:471, and
  the init is the disk itself). Everything downstream of the pupil multiply
  is therefore exactly zero outside the disk's static 8-aligned bounding box
  ``[lo, lo+b)²``: the IFFT contracts over only the bbox rows/cols, the
  forward FFT produces only the bbox output rows/cols, the window read/write
  and the whole pupil update shrink from Np² to b² — **bit-exact** semantics
  at a fraction of the MXU padding waste and VPU window traffic. (A
  user-supplied resume state with pupil energy outside the NA disk — a state
  the solver itself can never produce — is cropped to the disk.)
* Dynamic patch windows: Mosaic needs 8-aligned sublane offsets and
  128-aligned lane offsets, so reads slice an aligned (win, lane_blk)
  block and rotate the residual (row, lane) offset in with dynamic
  ``pltpu.roll``; writes build an aligned delta block and rotate it out.
* The per-LED global ``max|O|`` (the reference's full-spectrum
  ``cv::minMaxLoc``, fpmMain.cpp:467) is maintained **incrementally**: a
  per-row lane-folded max cache (rows × 128 scratch) is refreshed only for
  the rows the object update touched, and the global max reduces the cache —
  exact semantics at ~1/3 the reduction traffic. ``global_max='lazy'``
  instead freezes max|O| at its sweep-start value (the same documented
  deviation as the XLA path's lazy mode).
* bf16x3 DFT matmuls: the static DFT matrices are pre-split into bf16
  (hi, lo) pairs on the host; only the dynamic operands are split in-kernel,
  once per complex matmul.

The pupil lives in the centered frame inside the kernel; the wrapper
converts from/to the solver's DC-at-corner convention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fft import _dft_matrix_np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _support_bbox(n: int, radius: int) -> tuple[int, int]:
    """(b, lo): 8-aligned bounding box of the centered NA disk, or (n, 0).

    The disk is ``dist² <= radius²`` around ``c = round(n/2)``
    (geometry.pupil_support), i.e. rows/cols [c-radius, c+radius] inclusive.
    ``radius <= 0`` disables the restriction (full patch).
    """
    if radius <= 0:
        return n, 0
    c = round(n / 2)
    lo = max(0, ((c - radius) // 8) * 8)
    hi = min(n, _round_up(c + radius + 1, 8))
    b = hi - lo
    if b >= n or b <= 0:
        return n, 0
    return b, lo


# Pre-split the static DFT matrices into bf16 (hi, lo) on the host instead
# of splitting them in-kernel every LED. Measured SLOWER on v5e (~+100 ns/LED
# on mono): Mosaic feeds the MXU faster from f32 VMEM operands it splits
# itself than from pre-split bf16 arrays. Kept toggleable for re-measurement.
_PRESPLIT_STATIC_MATS = False


@functools.lru_cache(maxsize=16)
def _sel_dft_mats(n: int, b: int, lo: int, dft_precision: str):
    """Host-precomputed DFT matrices: fftshifts folded in, bbox-selected.

    For even n the half-roll permutation S satisfies S = Sᵀ = S⁻¹, so
      fftshift(fft2(y))     = (S·F) y (F·S)      — forward, centered output
      ifft2(ifftshift(X))   = (F⁻¹·S) X (S·F⁻¹)  — centered input
    With the pupil-support bbox ``sel = lo:lo+b`` the IFFT contracts over
    only the bbox rows/cols of its (bbox-supported) input and the forward
    FFT emits only the bbox rows/cols of its output:
      Ai = (F⁻¹S)[:, sel] (n, b)    Bi = (SF⁻¹)[sel, :] (b, n)
      Af = (SF)[sel, :]   (b, n)    Bf = (FS)[:, sel]   (n, b)
    Returned as float32 (real, imag) plane pairs for ``'highest'``, or as
    pre-split bf16 (real_hi, real_lo, imag_hi, imag_lo) quads for
    ``'bf16x3'`` (splitting the static matrices in-kernel would waste VPU
    cycles every LED).
    """
    h = n // 2
    fwd = _dft_matrix_np(n, False, "complex64")
    inv = _dft_matrix_np(n, True, "complex64")
    ai = np.roll(inv, -h, axis=1)[:, lo:lo + b]   # (F⁻¹ S)[:, sel]
    bi = np.roll(inv, -h, axis=0)[lo:lo + b, :]   # (S F⁻¹)[sel, :]
    af = np.roll(fwd, -h, axis=0)[lo:lo + b, :]   # (S F)[sel, :]
    bf = np.roll(fwd, -h, axis=1)[:, lo:lo + b]   # (F S)[:, sel]
    out = []
    for m in (ai, bi, af, bf):
        for plane in (m.real, m.imag):
            plane = np.ascontiguousarray(plane, np.float32)
            if dft_precision == "bf16x3" and _PRESPLIT_STATIC_MATS:
                hi_p = plane.astype(ml_dtypes.bfloat16)
                lo_p = (plane - hi_p.astype(np.float32)).astype(ml_dtypes.bfloat16)
                out += [hi_p, lo_p]
            else:
                out.append(plane)
    return tuple(out)


def _bf16_split(x):
    """f32 → (hi, lo) bf16 pair with hi + lo ≈ x to ~16 mantissa bits."""
    hi = x.astype(jnp.bfloat16)
    return hi, (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)


def _dot_bf16(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_exact(a, b):
    return jnp.dot(
        a, b,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _cmat_fns(dft_precision: str):
    """Complex-matmul helpers for a static-left (A @ z) and static-right
    (t @ B) stage, with the static matrices pre-split for bf16x3.

    TPU matmul precision tiers: single-pass bf16 (DEFAULT) has ~1e-2
    relative error — far too coarse for the DFT inside an iterative
    phase-retrieval loop; Precision.HIGHEST is exact f32 but runs 6 bf16
    passes. The 3-pass split (ah·bh + ah·bl + al·bh, dropping the ~2⁻¹⁸
    al·bl term, f32 accumulation) measures ~2e-6 relative error on the
    full reconstruction after 10 sweeps — below the c64 round-off the
    solver already carries — at twice the MXU throughput of HIGHEST.
    (Mosaic has no Precision.HIGH; the Gauss 3-multiplication trick was
    also measured: no faster, 7× worse error.)
    """
    if dft_precision == "bf16x3":

        def d3(ah, al, bh, bl):
            return _dot_bf16(ah, bh) + _dot_bf16(ah, bl) + _dot_bf16(al, bh)

        def load_split(ms):
            if _PRESPLIT_STATIC_MATS:
                return tuple(m[...] for m in ms)
            mr, mi = ms[0][...], ms[1][...]
            mrh, mrl = _bf16_split(mr)
            mih, mil = _bf16_split(mi)
            return mrh, mrl, mih, mil

        def cmat_left(ms, zr, zi):
            mrh, mrl, mih, mil = load_split(ms)
            zrh, zrl = _bf16_split(zr)
            zih, zil = _bf16_split(zi)
            rr = d3(mrh, mrl, zrh, zrl) - d3(mih, mil, zih, zil)
            ri = d3(mrh, mrl, zih, zil) + d3(mih, mil, zrh, zrl)
            return rr, ri

        def cmat_right(tr, ti, ms):
            mrh, mrl, mih, mil = load_split(ms)
            trh, trl = _bf16_split(tr)
            tih, til = _bf16_split(ti)
            rr = d3(trh, trl, mrh, mrl) - d3(tih, til, mih, mil)
            ri = d3(trh, trl, mih, mil) + d3(tih, til, mrh, mrl)
            return rr, ri

        return cmat_left, cmat_right, 4 if _PRESPLIT_STATIC_MATS else 2

    def cmat_left(ms, zr, zi):
        mr, mi = ms[0][...], ms[1][...]
        rr = _dot_exact(mr, zr) - _dot_exact(mi, zi)
        ri = _dot_exact(mr, zi) + _dot_exact(mi, zr)
        return rr, ri

    def cmat_right(tr, ti, ms):
        mr, mi = ms[0][...], ms[1][...]
        rr = _dot_exact(tr, mr) - _dot_exact(ti, mi)
        ri = _dot_exact(tr, mi) + _dot_exact(ti, mr)
        return rr, ri

    return cmat_left, cmat_right, 2


def _fold_lanes_max(t):
    """Fold a (rows, G·128) array to (rows, 128) by max over lane groups."""
    groups = t.shape[1] // 128
    cm = t[:, 0:128]
    for g in range(1, groups):
        cm = jnp.maximum(cm, t[:, g * 128:(g + 1) * 128])
    return cm


def _read_window(o_ref, plane, ys0, dy, xs0, dx, b, win, lane_blk):
    """Read the (b, b) window at dynamic offset (ys0+dy, xs0+dx).

    Slices an aligned (win, lane_blk) block at the 8-aligned row ``ys0`` and
    128-aligned lane ``xs0``, rotates the residual offsets in with dynamic
    rolls, then takes the static corner.
    """
    blk = o_ref[
        plane,
        pl.ds(pl.multiple_of(ys0, 8), win),
        pl.ds(pl.multiple_of(xs0, 128), lane_blk),
    ]
    # Positive modular shifts only: dynamic pltpu.roll with negative shifts
    # miscompiles on TPU (verified empirically — wrong data, no error).
    blk = pltpu.roll(pltpu.roll(blk, win - dy, 0), lane_blk - dx, 1)
    return blk[0:b, 0:b]


def _window_add(o_ref, ys0, dy, xs0, dx, do_r, do_i, b, win, lane_blk):
    """Add the (b, b) deltas into both planes at offset (ys0+dy, xs0+dx)."""
    rows = pl.ds(pl.multiple_of(ys0, 8), win)
    cols = pl.ds(pl.multiple_of(xs0, 128), lane_blk)
    for plane, do in ((0, do_r), (1, do_i)):
        blk = jnp.pad(do, ((0, win - b), (0, lane_blk - b)))
        blk = pltpu.roll(pltpu.roll(blk, dy, 0), dx, 1)
        o_ref[plane, rows, cols] = o_ref[plane, rows, cols] + blk


def _sweep_kernel(
    # scalar prefetch
    starts_ref,
    # refs: amp, sup, *mats, o_in, p_in, o_out, p_out, rowmax/omax scratch
    *refs,
    np_size: int, bbox: int, bbox_lo: int, win: int, lane_blk: int,
    n_mats: int, delta1: float, delta2: float, eps: float,
    dft_precision: str, global_max: str, ablate: str,
):
    n, b, lo = np_size, bbox, bbox_lo
    amp_ref, sup_ref = refs[0], refs[1]
    mats = refs[2:2 + n_mats]
    o_ref = refs[2 + n_mats + 2]   # aliased outputs (inputs at +0, +1)
    p_ref = refs[2 + n_mats + 3]
    rm_ref = refs[2 + n_mats + 4]

    k = pl.program_id(0)
    cmat_left, cmat_right, per = _cmat_fns(dft_precision)
    ms_ai, ms_bi, ms_af, ms_bf = (
        mats[i * per:(i + 1) * per] for i in range(4)
    )

    track_omax = ablate != "omax-const"
    if track_omax:
        # Sweep-start max|O|² cache: full fold for the incremental exact
        # mode, a frozen scalar for the lazy mode (fpmMain.cpp:467 — the
        # reference recomputes the full max after every object update).
        @pl.when(k == 0)
        def _init_rowmax():
            t = o_ref[0][...] ** 2 + o_ref[1][...] ** 2
            if global_max == "exact":
                rm_ref[...] = _fold_lanes_max(t)
            else:
                rm_ref[0, 0] = jnp.max(t)

    ys = starts_ref[2 * k] + lo
    xs = starts_ref[2 * k + 1] + lo
    ys0 = (ys // 8) * 8
    dy = ys - ys0
    xs0 = (xs // 128) * 128
    dx = xs - xs0

    # --- centered sub-spectrum patch, bbox only (fpmMain.cpp:358-362)
    if ablate == "no-window-read":
        oc_r = o_ref[0, 0:b, 0:b]
        oc_i = o_ref[1, 0:b, 0:b]
    else:
        oc_r = _read_window(o_ref, 0, ys0, dy, xs0, dx, b, win, lane_blk)
        oc_i = _read_window(o_ref, 1, ys0, dy, xs0, dx, b, win, lane_blk)

    # --- apply (centered, bbox-cropped) pupil (fpmMain.cpp:364)
    p_r = p_ref[0]
    p_i = p_ref[1]
    ocp_r = oc_r * p_r - oc_i * p_i
    ocp_i = oc_r * p_i + oc_i * p_r

    # --- to image plane: IFFT∘ifftshift folded into the matrices, (b,b)→(n,n)
    if ablate == "no-dft":
        img_r = jnp.pad(ocp_r, ((0, n - b), (0, n - b)))
        img_i = jnp.pad(ocp_i, ((0, n - b), (0, n - b)))
    else:
        tr, ti = cmat_left(ms_ai, ocp_r, ocp_i)        # (n, b)
        img_r, img_i = cmat_right(tr, ti, ms_bi)       # (n, n)

    # --- amplitude replacement preserving phase (fpmMain.cpp:377-394);
    #     eps on the real part only, as the reference's scalar cv::add.
    amp = amp_ref[0]
    mag2 = (img_r + eps) ** 2 + img_i ** 2
    scale = amp * jax.lax.rsqrt(mag2)
    rep_r = img_r * scale
    rep_i = img_i * scale

    # --- back to the centered Fourier frame, bbox rows/cols only: (n,n)→(b,b)
    if ablate == "no-dft":
        up_r = rep_r[0:b, 0:b]
        up_i = rep_i[0:b, 0:b]
    else:
        tr2, ti2 = cmat_left(ms_af, rep_r, rep_i)      # (b, n)
        up_r, up_i = cmat_right(tr2, ti2, ms_bf)       # (b, b)
    d_r = up_r - ocp_r
    d_i = up_i - ocp_i

    # --- object update (fpmMain.cpp:404-447):
    #     ΔO = diff · |P| · conj(P) / (max|P| · (|P|² + delta2))
    pabs2 = p_r * p_r + p_i * p_i
    pabs = jnp.sqrt(pabs2)
    pmax = jnp.sqrt(jnp.max(pabs2))
    recip_o = 1.0 / (pmax * (pabs2 + delta2))
    wr = pabs * p_r * recip_o
    wi = -pabs * p_i * recip_o
    do_r = d_r * wr - d_i * wi
    do_i = d_r * wi + d_i * wr
    if ablate != "no-window-write":
        _window_add(o_ref, ys0, dy, xs0, dx, do_r, do_i, b, win, lane_blk)

    # --- global max|O| over the *updated* spectrum (fpmMain.cpp:460,467)
    if not track_omax:
        omax = 1.0 + jnp.float32(k)  # keep data dependence, skip the reduction
    elif global_max == "exact":
        rows = pl.ds(pl.multiple_of(ys0, 8), win)
        t = o_ref[0, rows, :] ** 2 + o_ref[1, rows, :] ** 2
        rm_ref[rows, :] = _fold_lanes_max(t)
        omax = jnp.sqrt(jnp.max(rm_ref[...]))
    else:
        omax = jnp.sqrt(rm_ref[0, 0])

    # --- EPRY pupil update (fpmMain.cpp:457-475), all (b, b):
    #     ΔP = diff · |Oc| · conj(Oc) / (max|O| · (|Oc|² + delta1)) · support
    oabs2 = oc_r * oc_r + oc_i * oc_i
    oabs = jnp.sqrt(oabs2)
    recip_p = 1.0 / (omax * (oabs2 + delta1))
    sup = sup_ref[...]
    vr = oabs * oc_r * recip_p * sup
    vi = -oabs * oc_i * recip_p * sup
    p_ref[0] = p_r + (d_r * vr - d_i * vi)
    p_ref[1] = p_i + (d_r * vi + d_i * vr)


@functools.partial(
    jax.jit,
    static_argnames=(
        "np_size", "n_large", "delta1", "delta2", "eps", "interpret",
        "dft_precision", "pupil_radius", "global_max", "ablate",
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
    pupil_radius: int = 0,
    global_max: str = "exact",
    ablate: str = "",
):
    """One full sequential EPRY sweep as a single fused Pallas kernel.

    Numerically equivalent to ``models.epry.sweep_sequential`` (validated in
    tests; ``dft_precision='highest'`` matches to f32 round-off, the default
    ``'bf16x3'`` to ~1e-6 relative — see :func:`_cmat_fns` — at ~2× the MXU
    throughput). ``pupil_radius`` (geometry.pupil_radius) enables the exact
    pupil-support bbox restriction; 0 disables it. ``global_max='lazy'``
    freezes max|O| at its sweep-start value (same deviation as the XLA
    path). ``ablate`` disables kernel stages for benchmark time attribution
    (benchmarks/ablate.py) — output is garbage unless empty.
    """
    if dft_precision not in ("bf16x3", "highest"):
        raise ValueError(
            f"dft_precision must be 'bf16x3' or 'highest', got {dft_precision!r}"
        )
    if global_max not in ("exact", "lazy"):
        raise ValueError(f"global_max must be 'exact' or 'lazy', got {global_max!r}")
    k = amps.shape[0]
    n = np_size
    b, lo = _support_bbox(n, pupil_radius)
    win = _round_up(b + 8, 8)
    lane_blk = _round_up(b, 128) + 128
    # Static bounds: window starts satisfy ys, xs ∈ [lo, Nlarge - n + lo].
    max_off = n_large - n + lo
    lanes = max(_round_up(n_large, 128), (max_off // 128) * 128 + lane_blk)
    rows_pad = max(_round_up(n_large, 8), (max_off // 8) * 8 + win)
    f32 = jnp.float32

    mats = [jnp.asarray(m) for m in _sel_dft_mats(n, b, lo, dft_precision)]
    n_mats = len(mats)

    # Kernel-side pupil/support live in the centered frame, bbox-cropped.
    half = n // 2
    p_centered = jnp.roll(p_planes, (half, half), axis=(1, 2))[:, lo:lo + b, lo:lo + b]
    sup_centered = jnp.roll(support, (half, half), axis=(0, 1))[lo:lo + b, lo:lo + b]

    o_padded = jnp.pad(
        o_planes, ((0, 0), (0, rows_pad - n_large), (0, lanes - n_large))
    )

    if global_max == "exact" and ablate != "omax-const":
        scratch = [pltpu.VMEM((rows_pad, 128), f32)]   # per-row lane-folded max|O|²
    else:
        scratch = [pltpu.SMEM((1, 1), f32)]            # frozen sweep-start max|O|²

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda i, s: (i, 0, 0)),  # amps per-LED block
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + n_mats + 2),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
    )

    kernel = functools.partial(
        _sweep_kernel, np_size=n, bbox=b, bbox_lo=lo, win=win,
        lane_blk=lane_blk, n_mats=n_mats,
        delta1=delta1, delta2=delta2, eps=eps, dft_precision=dft_precision,
        global_max=global_max, ablate=ablate,
    )
    o_out, p_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((2, rows_pad, lanes), f32),
            jax.ShapeDtypeStruct((2, b, b), f32),
        ),
        input_output_aliases={3 + n_mats: 0, 4 + n_mats: 1},  # o, p
        interpret=interpret,
    )(starts_flat, amps, sup_centered, *mats, o_padded, p_centered)

    # Back to solver conventions: trim padding, un-crop the pupil bbox,
    # pupil to corner frame.
    p_full = jnp.zeros((2, n, n), f32)
    p_full = jax.lax.dynamic_update_slice(p_full, p_out, (0, lo, lo))
    p_corner = jnp.roll(p_full, (-half, -half), axis=(1, 2))
    return o_out[:, :n_large, :n_large], p_corner
