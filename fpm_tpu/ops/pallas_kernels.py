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
  is therefore exactly zero outside the disk's static bounding box
  ``[lo, lo+b)²`` (b 8-aligned; lo need not be aligned — dynamic-window
  reads absorb any offset): the IFFT contracts over only the bbox rows/cols,
  the forward FFT produces only the bbox output rows/cols, the window
  read/write and the whole pupil update shrink from Np² to b² — **bit-exact**
  semantics at a fraction of the MXU padding waste and VPU window traffic.
  For the mono configs (Np=90, NA radius 30) the unaligned-lo box is b=64,
  so the *stacked* contraction below hits 128 lanes exactly. (A
  user-supplied resume state with pupil energy outside the NA disk — a state
  the solver itself can never produce — is cropped to the disk.)
* **Block-complex (stacked) DFT matmuls**: a complex matmul is one real
  matmul on the block form ``[[Re, −Im], [Im, Re]]``. The four per-LED
  complex DFT products (IFFT rows/cols, FFT rows/cols) each lower to ONE
  real MXU matmul against a host-precomputed static block matrix, with the
  dynamic operand's (re, im) planes concatenated along the contraction dim:

    ifft rows:  [[Ar, −Ai], [Ai, Ar]] (2Np', 2b) @ [zr; zi]   (2b, b)
    ifft cols:  [tr | ti] (Np', 2b) @ [[Br, Bi], [−Bi, Br]]   (2b, 2Nl)
    fft rows:   [[Ar',−Ai'], [Ai',Ar']] (2b, 2Np') @ [yr; yi] (2Np', Nl)
    fft cols:   [ur | uu] (b, 2Nl) @ [[Br',Bi'], [−Bi',Br']]  (2Nl, 2Bl)

  (Np' = Np 8-padded, Nl = Np 128-padded, Bl = b 128-padded; all block
  offsets land on sublane/lane tile boundaries except the one (Np', 2b)
  lane concat.) vs. 16 separate real matmuls this halves the padded MXU
  tile work and quarters the dispatch count; the products and their f32
  accumulation are bitwise the sums of the unstacked form.
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
* bf16x3 DFT matmuls: the static block matrices are pre-split into bf16
  (hi, lo) pairs on the host; only the dynamic operands are split in-kernel,
  once per matmul.

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
    """(b, lo): bounding box of the centered NA disk; b 8-aligned, lo free.

    The disk is ``dist² <= radius²`` around ``c = round(n/2)``
    (geometry.pupil_support), i.e. rows/cols [c-radius, c+radius] inclusive.
    ``lo`` is NOT alignment-rounded (the kernel's dynamic windows absorb any
    offset); only the box size is 8-padded, which keeps b minimal — for the
    mono configs (n=90, radius=30) b=64, so the stacked DFT contraction of
    2b lands exactly on 128 MXU lanes. ``radius <= 0`` (restriction
    disabled) degenerates to the full 8-padded patch at lo=0; ``lo + b`` may
    then exceed ``n`` — the wrapper zero-pads the pupil/support crops, which
    keeps the out-of-patch rows exactly zero through every update.
    """
    if radius <= 0:
        return _round_up(n, 8), 0
    c = round(n / 2)
    b = _round_up(2 * radius + 1, 8)
    if b >= n:
        return _round_up(n, 8), 0
    lo = c - radius
    return b, lo


# Pre-split the static DFT block matrices into bf16 (hi, lo) pairs on the
# host instead of splitting them in-kernel every LED. With the stacked block
# form the statics are ~4× the element count of the old per-plane matrices,
# so host pre-splitting is the default; flip to re-measure (measured ±8 ns
# on mono — noise).
_PRESPLIT_STATIC_MATS = True

# Lay the R_inv contraction blocks at 128-lane offsets so the kernel's one
# unaligned lane concat (ts, offset b) becomes an aligned pad+concat, at the
# price of a 2× contraction dim on the ifft-cols matmul. Measurement knob.
_TS_ALIGN_128 = False


@functools.lru_cache(maxsize=16)
def _block_dft_mats(n: int, b: int, lo: int, dft_precision: str):
    """Host-precomputed static DFT *block* matrices: fftshifts folded in,
    bbox-selected, complex structure expanded to ``[[Re, −Im], [Im, Re]]``
    real blocks at tile-aligned offsets.

    For even n the half-roll permutation S satisfies S = Sᵀ = S⁻¹, so
      fftshift(fft2(y))     = (S·F) y (F·S)      — forward, centered output
      ifft2(ifftshift(X))   = (F⁻¹·S) X (S·F⁻¹)  — centered input
    With the pupil-support bbox ``sel = lo:lo+b`` the IFFT contracts over
    only the bbox rows/cols of its (bbox-supported) input and the forward
    FFT emits only the bbox rows/cols of its output:
      Ai = (F⁻¹S)[:, sel] (n, b)    Bi = (SF⁻¹)[sel, :] (b, n)
      Af = (SF)[sel, :]   (b, n)    Bf = (FS)[:, sel]   (n, b)
    Block layouts (np8 = roundup(n,8), nl = roundup(n,128),
    bl = roundup(b,128); row blocks at sublane-aligned offsets, col blocks
    at lane-aligned offsets, zero-padded):
      L_inv (2·np8, 2b):  [[Ai.re, −Ai.im], [Ai.im, Ai.re]]
      R_inv (2b, 2·nl):   [[Bi.re,  Bi.im], [−Bi.im, Bi.re]]
      L_fwd (2b, 2·np8):  [[Af.re, −Af.im], [Af.im, Af.re]]
      R_fwd (2·nl, 2·bl): [[Bf.re,  Bf.im], [−Bf.im, Bf.re]]
    Returned in that order as float32 arrays for ``'highest'`` or bf16
    (hi, lo) pairs for ``'bf16x3'`` (when pre-splitting is on).
    """
    np8 = _round_up(n, 8)
    nl = _round_up(n, 128)
    bl = _round_up(b, 128)
    h = n // 2
    fwd = _dft_matrix_np(n, False, "complex64")
    inv = _dft_matrix_np(n, True, "complex64")
    bsel = min(b, n - lo)  # valid bbox extent inside the patch
    ai = np.roll(inv, -h, axis=1)[:, lo:lo + bsel]   # (n, bsel)
    bi = np.roll(inv, -h, axis=0)[lo:lo + bsel, :]   # (bsel, n)
    af = np.roll(fwd, -h, axis=0)[lo:lo + bsel, :]   # (bsel, n)
    bf = np.roll(fwd, -h, axis=1)[:, lo:lo + bsel]   # (n, bsel)

    def block(m, rows, cols, r_off, c_off):
        """[[m.re, −m.im], [m.im, m.re]] blocks at (r_off, c_off) offsets."""
        out = np.zeros((2 * rows, 2 * cols), np.float32)
        r, c = m.shape
        out[0:r, 0:c] = m.real
        out[0:r, c_off:c_off + c] = -m.imag
        out[r_off:r_off + r, 0:c] = m.imag
        out[r_off:r_off + r, c_off:c_off + c] = m.real
        return out

    # R-side blocks carry [[Re, Im], [−Im, Re]] (the transpose convention
    # for a right-multiplied static): conj the matrix then negate... simpler
    # to build directly from ±imag.
    def block_r(m, rows, cols, r_off, c_off):
        out = np.zeros((2 * rows, 2 * cols), np.float32)
        r, c = m.shape
        out[0:r, 0:c] = m.real
        out[0:r, c_off:c_off + c] = m.imag
        out[r_off:r_off + r, 0:c] = -m.imag
        out[r_off:r_off + r, c_off:c_off + c] = m.real
        return out

    b_ri = bl if _TS_ALIGN_128 else b
    mats = (
        block(ai, np8, b, np8, b),      # L_inv (2·np8, 2b)
        block_r(bi, b_ri, nl, b_ri, nl),  # R_inv (2·b_ri, 2·nl)
        block(af, b, np8, b, np8),      # L_fwd (2b, 2·np8)
        block_r(bf, nl, bl, nl, bl),    # R_fwd (2·nl, 2·bl)
    )
    out = []
    for m in mats:
        if dft_precision == "bf16x3" and _PRESPLIT_STATIC_MATS:
            hi_p = m.astype(ml_dtypes.bfloat16)
            lo_p = (m - hi_p.astype(np.float32)).astype(ml_dtypes.bfloat16)
            out += [hi_p, lo_p]
        else:
            out.append(m)
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


def _mm_fns(dft_precision: str, ablate: str = ""):
    """(mm_left, mm_right, mats_per): one real block matmul per complex DFT
    product — static side pre-split on the host for bf16x3, dynamic side
    split in-kernel once per matmul.

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
    if ablate == "dft-1pass":
        # Single-pass bf16 (garbage numerics): isolates the MXU pass count
        # and the dynamic-split VPU cost from the fixed per-matmul overhead.
        def mm_left(ms, x):
            return _dot_bf16(ms[0][...].astype(jnp.bfloat16), x.astype(jnp.bfloat16))

        def mm_right(x, ms):
            return _dot_bf16(x.astype(jnp.bfloat16), ms[0][...].astype(jnp.bfloat16))

        return mm_left, mm_right, 2 if (
            dft_precision == "bf16x3" and _PRESPLIT_STATIC_MATS
        ) else 1

    if dft_precision == "bf16x3":

        def load_split(ms):
            if _PRESPLIT_STATIC_MATS:
                return ms[0][...], ms[1][...]
            return _bf16_split(ms[0][...])

        def mm_left(ms, x):      # static @ dynamic
            mh, ml = load_split(ms)
            xh, xl = _bf16_split(x)
            return _dot_bf16(mh, xh) + _dot_bf16(mh, xl) + _dot_bf16(ml, xh)

        def mm_right(x, ms):     # dynamic @ static
            mh, ml = load_split(ms)
            xh, xl = _bf16_split(x)
            return _dot_bf16(xh, mh) + _dot_bf16(xl, mh) + _dot_bf16(xh, ml)

        return mm_left, mm_right, 2 if _PRESPLIT_STATIC_MATS else 1

    def mm_left(ms, x):
        return _dot_exact(ms[0][...], x)

    def mm_right(x, ms):
        return _dot_exact(x, ms[0][...])

    return mm_left, mm_right, 1


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


# Window-write lane alignment: 'roll' (default) uses a dynamic pltpu.roll;
# 'mxu' shifts the delta into lane position by an exact one-hot matmul
# (3-term bf16 split — bitwise f32, since each term's products are exact and
# the f32 accumulation reconstructs the mantissa). Measured on v5e (mono):
# mxu is ~150 ns/LED SLOWER — the write stage is bound by the serialized
# read-modify-write of the spectrum window, not by the lane rotate.
_WINDOW_WRITE_IMPL = "roll"


def _bf16_split3(x):
    """f32 → (h1, h2, h3) bf16 triple with h1 + h2 + h3 == x exactly
    (24-bit mantissa = 3 × 8-bit bf16 chunks; every residual is exactly
    representable, so the f32 sum reconstructs x bitwise)."""
    h1 = x.astype(jnp.bfloat16)
    r1 = x - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    r2 = r1 - h2.astype(jnp.float32)
    return h1, h2, r2.astype(jnp.bfloat16)


def _window_add(o_ref, ys0, dy, xs0, dx, do_r, do_i, b, win, lane_blk):
    """Add the (b, b) deltas into both planes at offset (ys0+dy, xs0+dx)."""
    rows = pl.ds(pl.multiple_of(ys0, 8), win)
    cols = pl.ds(pl.multiple_of(xs0, 128), lane_blk)
    if _WINDOW_WRITE_IMPL == "mxu":
        # One-hot lane-shift matrix C[j, l] = (l == j + dx), exact in bf16.
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (b, lane_blk), 0)
        l_ids = jax.lax.broadcasted_iota(jnp.int32, (b, lane_blk), 1)
        shift = (l_ids == r_ids + dx).astype(jnp.bfloat16)
    for plane, do in ((0, do_r), (1, do_i)):
        if _WINDOW_WRITE_IMPL == "mxu":
            blk = sum(_dot_bf16(h, shift) for h in _bf16_split3(do))
            blk = pltpu.roll(jnp.pad(blk, ((0, win - b), (0, 0))), dy, 0)
        else:
            blk = jnp.pad(do, ((0, win - b), (0, lane_blk - b)))
            blk = pltpu.roll(pltpu.roll(blk, dy, 0), dx, 1)
        o_ref[plane, rows, cols] = o_ref[plane, rows, cols] + blk


def _sweep_kernel(
    # scalar prefetch
    starts_ref,
    # refs: amp, sup, *mats, o_in, p_in, o_out, p_out, mets_out,
    #       rowmax/omax scratch
    *refs,
    np_size: int, bbox: int, bbox_lo: int, win: int, lane_blk: int,
    n_mats: int, delta1: float, delta2: float, eps: float,
    dft_precision: str, global_max: str, collect_metrics: bool, ablate: str,
):
    n, b, lo = np_size, bbox, bbox_lo
    np8 = _round_up(n, 8)
    nl = _round_up(n, 128)
    bl = _round_up(b, 128)
    amp_ref, sup_ref = refs[0], refs[1]
    mats = refs[2:2 + n_mats]
    o_ref = refs[2 + n_mats + 2]   # aliased outputs (inputs at +0, +1)
    p_ref = refs[2 + n_mats + 3]
    mets_ref = refs[2 + n_mats + 4]
    rm_ref = refs[2 + n_mats + 5]

    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init_mets():
        mets_ref[0] = jnp.zeros((), jnp.float32)
        mets_ref[1] = jnp.zeros((), jnp.float32)
    mm_left, mm_right, per = _mm_fns(dft_precision, ablate)
    ms_li, ms_ri, ms_lf, ms_rf = (
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

    # --- to image plane: IFFT∘ifftshift folded into the block matrices,
    #     (b,b)→(np8, nl) zero-padded planes
    if ablate == "no-dft":
        img_r = jnp.pad(ocp_r, ((0, np8 - b), (0, nl - b)))
        img_i = jnp.pad(ocp_i, ((0, np8 - b), (0, nl - b)))
    else:
        zs = jnp.concatenate([ocp_r, ocp_i], axis=0)       # (2b, b)
        t = mm_left(ms_li, zs)                             # (2·np8, b)
        if _TS_ALIGN_128:
            ts = jnp.concatenate(
                [jnp.pad(t[0:np8], ((0, 0), (0, bl - b))), t[np8:]], axis=1
            )                                              # (np8, bl + b)
            ts = jnp.pad(ts, ((0, 0), (0, 2 * bl - bl - b)))
        else:
            ts = jnp.concatenate([t[0:np8], t[np8:]], axis=1)  # (np8, 2b)
        img2 = mm_right(ts, ms_ri)                         # (np8, 2·nl)
        img_r = img2[:, 0:nl]
        img_i = img2[:, nl:]

    # --- amplitude replacement preserving phase (fpmMain.cpp:377-394);
    #     eps on BOTH channels (cv::add scalar-unroll semantics, verified
    #     against the compiled reference binary in test_reference_binary).
    #     Zero-padded region: img = 0, amp = 0 → rep = 0 stays exact.
    amp = amp_ref[0]
    mag2 = (img_r + eps) ** 2 + (img_i + eps) ** 2
    scale = amp * jax.lax.rsqrt(mag2)
    rep_r = img_r * scale
    rep_i = img_i * scale

    if collect_metrics:
        # per-LED data residual Σ(A − |img|)² (fpmMain-parity telemetry;
        # padded region: amp = img = 0 contributes nothing)
        term = amp - jnp.sqrt(img_r * img_r + img_i * img_i)
        mets_ref[0] = mets_ref[0] + jnp.sum(term * term)

    # --- back to the centered Fourier frame, bbox rows/cols only:
    #     (np8, nl)→(b, b)
    if ablate == "no-dft":
        up_r = rep_r[0:b, 0:b]
        up_i = rep_i[0:b, 0:b]
    else:
        zs3 = jnp.concatenate([rep_r, rep_i], axis=0)      # (2·np8, nl)
        t2 = mm_left(ms_lf, zs3)                           # (2b, nl)
        ts4 = jnp.concatenate([t2[0:b], t2[b:]], axis=1)   # (b, 2·nl)
        up2 = mm_right(ts4, ms_rf)                         # (b, 2·bl)
        up_r = up2[:, 0:b]
        up_i = up2[:, bl:bl + b]
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
    if collect_metrics:
        mets_ref[1] = mets_ref[1] + jnp.sum(do_r * do_r + do_i * do_i)
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


# ------------------------------------------------------------------ chunked mode


# Empirically calibrated Mosaic compile ceiling for the batched-chunk
# kernels (v5e, ~16 MB VMEM): the chunk forward pass materializes
# (C·np8)-row stacked buffers in both the nl- and 2·nl-lane layouts, and
# remote compilation fails once the stacked row count C·np8 crosses
# ~3.3-4k rows. Measured boundary on hardware (round 4):
#   OK:   Np=200 C=16 (3200 rows), Np=100 C=32 (3328), Np=90 C=32 (3072)
#   FAIL: Np=200 C=20 (4000),      Np=100 C=64 (6656), Np=90 C=64 (6144)
# The limit is not explained by any single buffer's byte size (the mono
# C=64 failure is byte-wise smaller than the passing Np=200 C=16 case);
# stacked rows is the quantity that cleanly separates every measured
# point, so the guard clamps on it with the largest-known-good value.
_CHUNK_ROWS_LIMIT = 3328


def max_pallas_chunk(np_size: int) -> int:
    """Largest per-chunk LED count the fused chunked kernel compiles at.

    Callers requesting a bigger chunk should clamp (smaller chunks are
    strictly closer to the sequential Gauss–Seidel trajectory, so the
    clamp never hurts convergence — models/epry.py docstring).
    """
    return max(1, _CHUNK_ROWS_LIMIT // _round_up(np_size, 8))


def _window_offsets(starts_ref, idx, lo):
    """Decompose a patch start into aligned window offsets (ys0, dy, xs0, dx)."""
    ys = starts_ref[2 * idx] + lo
    xs = starts_ref[2 * idx + 1] + lo
    ys0 = (ys // 8) * 8
    xs0 = (xs // 128) * 128
    return ys0, ys - ys0, xs0, xs - xs0


def _batched_chunk_forward(
    o_ref, p_r, p_i, amp2d, starts_ref, base, mats, *,
    chunk: int, np_size: int, bbox: int, bbox_lo: int, win: int,
    lane_blk: int, eps: float, dft_precision: str, ablate: str = "",
):
    """Forward pass of one Jacobi chunk, all LEDs batched onto the MXU.

    The sequential kernel's four per-LED DFT matmuls are latency-bound (the
    measured wall is ~6× their MXU time at mono shapes — a serialized chain
    of small matmuls per LED). Here the whole chunk's LEDs are batched into
    the free dimension of each block matmul (N or M = C·b ≈ 2048 at mono
    chunk32 vs 64 per-LED), so the MXU runs full tiles; between the four
    matmuls the per-LED (re, im) blocks are re-laid-out with static slices
    (the flip between row-transform and column-transform layouts is inherent
    to a two-sided transform with shared static operands).

    Returns per-LED lists (offs, oc_r, oc_i, d_r, d_i) — the window offsets,
    chunk-start sub-spectrum crops, and the amplitude-replacement residual
    ``diff = Objfup − ObjfcropP`` — plus |img| planes for metrics.
    """
    n, b, lo = np_size, bbox, bbox_lo
    c = chunk
    np8 = _round_up(n, 8)
    nl = _round_up(n, 128)
    bl = _round_up(b, 128)
    mm_left, mm_right, per = _mm_fns(dft_precision, ablate)
    ms_li, ms_ri, ms_lf, ms_rf = (mats[i * per:(i + 1) * per] for i in range(4))

    offs, oc_r, oc_i, ocp_r, ocp_i = [], [], [], [], []
    for j in range(c):
        ys0, dy, xs0, dx = _window_offsets(starts_ref, base + j, lo)
        offs.append((ys0, dy, xs0, dx))
        if ablate == "no-window-read":
            r = o_ref[0, 0:b, 0:b]
            i_ = o_ref[1, 0:b, 0:b]
        else:
            r = _read_window(o_ref, 0, ys0, dy, xs0, dx, b, win, lane_blk)
            i_ = _read_window(o_ref, 1, ys0, dy, xs0, dx, b, win, lane_blk)
        oc_r.append(r)
        oc_i.append(i_)
        ocp_r.append(r * p_r - i_ * p_i)
        ocp_i.append(r * p_i + i_ * p_r)

    if ablate == "no-dft":
        img_r = jnp.concatenate(
            [jnp.pad(ocp_r[j], ((0, np8 - b), (0, nl - b))) for j in range(c)],
            axis=0,
        )
        img_i = jnp.concatenate(
            [jnp.pad(ocp_i[j], ((0, np8 - b), (0, nl - b))) for j in range(c)],
            axis=0,
        )
    else:
        # ifft rows: one (2·np8, 2b) @ (2b, C·b) matmul for the whole chunk
        zs = jnp.concatenate(
            [jnp.concatenate([ocp_r[j], ocp_i[j]], axis=0) for j in range(c)],
            axis=1,
        )                                               # (2b, C·b)
        t = mm_left(ms_li, zs)                          # (2·np8, C·b)
        # ifft cols: per-LED (re | im) lane concat, LEDs stacked along rows
        ts = jnp.concatenate(
            [
                jnp.concatenate(
                    [t[0:np8, j * b:(j + 1) * b], t[np8:, j * b:(j + 1) * b]],
                    axis=1,
                )
                for j in range(c)
            ],
            axis=0,
        )                                               # (C·np8, 2b)
        img2 = mm_right(ts, ms_ri)                      # (C·np8, 2·nl)
        img_r = img2[:, 0:nl]
        img_i = img2[:, nl:]

    # amplitude replacement, whole chunk at once (fpmMain.cpp:377-394);
    # eps on BOTH channels (cv::add scalar-unroll, see test_reference_binary).
    # Padded rows: img = 0, amp = 0 → rep = 0.
    mag2 = (img_r + eps) ** 2 + (img_i + eps) ** 2
    scale = amp2d * jax.lax.rsqrt(mag2)
    rep_r = img_r * scale
    rep_i = img_i * scale

    if ablate == "no-dft":
        d_r = [rep_r[j * np8:j * np8 + b, 0:b] - ocp_r[j] for j in range(c)]
        d_i = [rep_i[j * np8:j * np8 + b, 0:b] - ocp_i[j] for j in range(c)]
        return offs, oc_r, oc_i, d_r, d_i, img_r, img_i

    # fft rows
    zs3 = jnp.concatenate(
        [
            jnp.concatenate(
                [rep_r[j * np8:(j + 1) * np8], rep_i[j * np8:(j + 1) * np8]],
                axis=0,
            )
            for j in range(c)
        ],
        axis=1,
    )                                                   # (2·np8, C·nl)
    t2 = mm_left(ms_lf, zs3)                            # (2b, C·nl)
    ts4 = jnp.concatenate(
        [
            jnp.concatenate(
                [t2[0:b, j * nl:(j + 1) * nl], t2[b:, j * nl:(j + 1) * nl]],
                axis=1,
            )
            for j in range(c)
        ],
        axis=0,
    )                                                   # (C·b, 2·nl)
    up2 = mm_right(ts4, ms_rf)                          # (C·b, 2·bl)

    d_r = [up2[j * b:(j + 1) * b, 0:b] - ocp_r[j] for j in range(c)]
    d_i = [up2[j * b:(j + 1) * b, bl:bl + b] - ocp_i[j] for j in range(c)]
    return offs, oc_r, oc_i, d_r, d_i, img_r, img_i


def _chunked_kernel(
    # scalar prefetch
    starts_ref,
    valid_ref,
    # refs: amp2d, sup, *mats, o_in, p_in, o_out, p_out, mets_out
    *refs,
    chunk: int, np_size: int, bbox: int, bbox_lo: int, win: int,
    lane_blk: int, n_mats: int, delta1: float, delta2: float, eps: float,
    pupil_step_scale: float, dft_precision: str, collect_metrics: bool,
    ablate: str,
):
    """One grid step = one Jacobi chunk, updates applied in place.

    Semantics of ``models.epry.jacobi_chunk``: every LED's increment is
    computed from the chunk-start (O, P); object increments are then
    accumulated (window adds commute), ``max|O|`` is taken over the
    *updated* spectrum (fpmMain.cpp:460,467 — jacobi_chunk computes it
    post-update), and the pupil consensus adds the masked increment sum.
    With ``collect_metrics`` the (data-residual, update-norm) sums are
    accumulated across chunks into the SMEM metrics output — the same
    per-sweep convergence telemetry the XLA path emits (VERDICT r3 item 5).

    Negative result, measured round 4 (kept as a note so it isn't retried
    blindly): splitting the forward pass into sub-batches — legal in
    Jacobi, since every window read precedes every write — neither
    overlaps the VPU window traffic with the MXU chain (Mosaic schedules
    the stages in program order: 750 vs 726 ns/slot at mono chunk32) nor
    relaxes the compile ceiling (chunk 64 as two 32-LED stages still
    fails: the ceiling tracks the unrolled per-LED write/pupil loops).
    """
    n, b = np_size, bbox
    amp_ref, sup_ref = refs[0], refs[1]
    mats = refs[2:2 + n_mats]
    o_ref = refs[2 + n_mats + 2]   # aliased outputs (inputs at +0, +1)
    p_ref = refs[2 + n_mats + 3]
    mets_ref = refs[2 + n_mats + 4]

    k = pl.program_id(0)
    base = k * chunk
    p_r = p_ref[0]
    p_i = p_ref[1]

    @pl.when(k == 0)
    def _init_mets():
        mets_ref[0] = jnp.zeros((), jnp.float32)
        mets_ref[1] = jnp.zeros((), jnp.float32)

    offs, oc_r, oc_i, d_r, d_i, img_r, img_i = _batched_chunk_forward(
        o_ref, p_r, p_i, amp_ref[0], starts_ref, base, mats,
        chunk=chunk, np_size=n, bbox=b, bbox_lo=bbox_lo, win=win,
        lane_blk=lane_blk, eps=eps, dft_precision=dft_precision,
        ablate=ablate,
    )

    if collect_metrics:
        # data residual Σ m·(A − |img|)² (padded rows: amp = img = 0)
        np8 = _round_up(n, 8)
        absimg = jnp.sqrt(img_r * img_r + img_i * img_i)
        amp2d = amp_ref[0]
        resid = jnp.zeros((), jnp.float32)
        for j in range(chunk):
            rows = slice(j * np8, (j + 1) * np8)
            vm = valid_ref[base + j].astype(jnp.float32)
            term = amp2d[rows, :] - absimg[rows, :]
            resid = resid + vm * jnp.sum(term * term)
        mets_ref[0] = mets_ref[0] + resid

    # --- object update from the chunk-start pupil (fpmMain.cpp:404-447)
    pabs2 = p_r * p_r + p_i * p_i
    pabs = jnp.sqrt(pabs2)
    pmax = jnp.sqrt(jnp.max(pabs2))
    recip_o = 1.0 / (pmax * (pabs2 + delta2))
    wr = pabs * p_r * recip_o
    wi = -pabs * p_i * recip_o
    upd = jnp.zeros((), jnp.float32)
    for j in range(chunk):
        do_r = d_r[j] * wr - d_i[j] * wi
        do_i = d_r[j] * wi + d_i[j] * wr
        if collect_metrics:
            vm = valid_ref[base + j].astype(jnp.float32)
            upd = upd + vm * jnp.sum(do_r * do_r + do_i * do_i)
        if ablate == "no-window-write":
            continue

        @pl.when(valid_ref[base + j] > 0)
        def _add(do_r=do_r, do_i=do_i, off=offs[j]):
            _window_add(o_ref, off[0], off[1], off[2], off[3],
                        do_r, do_i, b, win, lane_blk)
    if collect_metrics:
        mets_ref[1] = mets_ref[1] + upd

    # --- post-update global max|O| (one full fold per chunk; the padded
    # border is exactly zero so it cannot win the max)
    if ablate == "omax-const":
        omax = 1.0 + jnp.float32(k)  # keep data dependence, skip the fold
    else:
        omax = jnp.sqrt(jnp.max(o_ref[0][...] ** 2 + o_ref[1][...] ** 2))

    # --- pupil consensus: masked sum of per-LED EPRY increments
    sup = sup_ref[...]
    acc_r = jnp.zeros((b, b), jnp.float32)
    acc_i = jnp.zeros((b, b), jnp.float32)
    recip_max = 1.0 / omax
    if ablate == "no-pupil-acc":
        acc_r = acc_r + 0.0 * (d_r[0] * recip_max)  # keep data dependence
    else:
        for j in range(chunk):
            oabs2 = oc_r[j] * oc_r[j] + oc_i[j] * oc_i[j]
            oabs = jnp.sqrt(oabs2)
            recip_p = recip_max / (oabs2 + delta1)
            vr = oabs * oc_r[j] * recip_p * sup
            vi = -oabs * oc_i[j] * recip_p * sup
            vm = valid_ref[base + j].astype(jnp.float32)
            acc_r = acc_r + vm * (d_r[j] * vr - d_i[j] * vi)
            acc_i = acc_i + vm * (d_r[j] * vi + d_i[j] * vr)
    p_ref[0] = p_r + pupil_step_scale * acc_r
    p_ref[1] = p_i + pupil_step_scale * acc_i


@functools.partial(
    jax.jit,
    static_argnames=(
        "np_size", "n_large", "delta1", "delta2", "eps", "interpret",
        "dft_precision", "pupil_radius", "pupil_step_scale",
        "collect_metrics", "ablate",
    ),
)
def fused_epry_chunked(
    o_planes,       # (2, Nlarge, Nlarge) f32, centered frame
    p_planes,       # (2, Np, Np) f32, DC-at-corner frame (solver convention)
    support,        # (Np, Np) f32, DC-at-corner frame
    amps,           # (n_chunks, C, Np, Np) f32, chunk-permuted schedule order
    starts_flat,    # (n_chunks·C·2,) int32: [y0, x0, y1, x1, ...]
    valid,          # (n_chunks·C,) int32: 1 = real LED, 0 = padded dummy
    *,
    np_size: int,
    n_large: int,
    delta1: float,
    delta2: float,
    eps: float,
    interpret: bool = False,
    dft_precision: str = "bf16x3",
    pupil_radius: int = 0,
    pupil_step_scale: float = 1.0,
    collect_metrics: bool = False,
    ablate: str = "",
):
    """One chunked Gauss–Seidel-over-Jacobi sweep as a single Pallas kernel.

    Numerically equivalent to ``models.epry.sweep_batched`` (the shardable
    mode — the answer to the reference's unparallelizable per-LED loop,
    fpmMain.cpp:348) up to f32/bf16x3 round-off; validated in
    tests/test_pallas.py. grid = (n_chunks,): chunks run sequentially
    (Gauss–Seidel), each chunk's LEDs batched onto the MXU (Jacobi), the
    spectrum VMEM-resident across chunks via input/output aliasing.

    Returns ``(o_planes, p_planes, mets)``; ``mets`` is the per-sweep
    (data-residual, update-norm) pair accumulated in-kernel when
    ``collect_metrics`` (zeros otherwise) — the same convergence telemetry
    as the XLA ``sweep_batched`` path (VERDICT r3 item 5).
    """
    if dft_precision not in ("bf16x3", "highest"):
        raise ValueError(
            f"dft_precision must be 'bf16x3' or 'highest', got {dft_precision!r}"
        )
    n_chunks, c = amps.shape[0], amps.shape[1]
    # The ceiling tracks the TOTAL chunk (the unrolled per-LED write and
    # pupil-consensus loops), not the forward-pass buffers: a chunk of 64
    # split into two 32-LED forward stages still fails remote compilation
    # (measured round 4), so staging does not relax this check.
    if not interpret and c * _round_up(np_size, 8) > _CHUNK_ROWS_LIMIT:
        raise ValueError(
            f"chunk of {c} LEDs at Np={np_size} exceeds the fused chunked "
            f"kernel's compile ceiling ({c * _round_up(np_size, 8)} stacked "
            f"rows > {_CHUNK_ROWS_LIMIT}); use chunk_size <= "
            f"{max_pallas_chunk(np_size)} (models.epry.reconstruct clamps "
            "this automatically)"
        )
    n = np_size
    b, lo = _support_bbox(n, pupil_radius)
    np8 = _round_up(n, 8)
    nl = _round_up(n, 128)
    win = _round_up(b + 8, 8)
    lane_blk = _round_up(b, 128) + 128
    max_off = n_large - n + lo
    lanes = max(_round_up(n_large, 128), (max_off // 128) * 128 + lane_blk)
    rows_pad = max(_round_up(n_large, 8), (max_off // 8) * 8 + win)
    f32 = jnp.float32

    mats = [jnp.asarray(m) for m in _block_dft_mats(n, b, lo, dft_precision)]
    n_mats = len(mats)

    half = n // 2
    bsel = min(b, n - lo)
    pad_b = ((0, 0), (0, b - bsel), (0, b - bsel))
    p_centered = jnp.pad(
        jnp.roll(p_planes, (half, half), axis=(1, 2))[:, lo:lo + bsel, lo:lo + bsel],
        pad_b,
    )
    sup_centered = jnp.pad(
        jnp.roll(support, (half, half), axis=(0, 1))[lo:lo + bsel, lo:lo + bsel],
        pad_b[1:],
    )

    o_padded = jnp.pad(
        o_planes, ((0, 0), (0, rows_pad - n_large), (0, lanes - n_large))
    )
    # Per-chunk amplitude block, rows = LEDs stacked: (n_chunks, C·np8, nl).
    amps_p = jnp.pad(
        amps, ((0, 0), (0, 0), (0, np8 - n), (0, nl - n))
    ).reshape(n_chunks, c * np8, nl)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, c * np8, nl), lambda i, s, v: (i, 0, 0)),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + n_mats + 2),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
    )

    kernel = functools.partial(
        _chunked_kernel, chunk=c, np_size=n, bbox=b, bbox_lo=lo, win=win,
        lane_blk=lane_blk, n_mats=n_mats,
        delta1=delta1, delta2=delta2, eps=eps,
        pupil_step_scale=pupil_step_scale, dft_precision=dft_precision,
        collect_metrics=collect_metrics, ablate=ablate,
    )
    o_out, p_out, mets = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((2, rows_pad, lanes), f32),
            jax.ShapeDtypeStruct((2, b, b), f32),
            jax.ShapeDtypeStruct((2,), f32),
        ),
        input_output_aliases={4 + n_mats: 0, 5 + n_mats: 1},  # o, p
        interpret=interpret,
    )(starts_flat, valid, amps_p, sup_centered, *mats, o_padded, p_centered)

    p_full = jnp.zeros((2, n, n), f32)
    p_full = jax.lax.dynamic_update_slice(
        p_full, p_out[:, :bsel, :bsel], (0, lo, lo)
    )
    p_corner = jnp.roll(p_full, (-half, -half), axis=(1, 2))
    return o_out[:, :n_large, :n_large], p_corner, mets


def _chunk_inc_kernel(
    # scalar prefetch
    starts_ref,
    valid_ref,
    # refs: amp2d, sup, *mats, o_block, d_out, v_out, mets_out
    *refs,
    chunk: int, np_size: int, bbox: int, bbox_lo: int, win: int,
    lane_blk: int, n_mats: int, delta1: float, delta2: float, eps: float,
    dft_precision: str, collect_metrics: bool,
):
    """Increment mode: one Jacobi chunk's *local* increments, nothing applied.

    The per-device body of the sharded sweeps (parallel/led_shard.py,
    tile_shard.py): collectives (object psum, global-max pmax, pupil
    consensus) must happen *between* computing increments and applying them,
    so this kernel only computes this device's contributions from the
    chunk-start state:

    * ``d_out``   — object-spectrum increments window-added into a zeroed
      block (same shape as the input spectrum block),
    * ``v_out``   — the pupil EPRY numerator sum
      ``Σ_j m_j · diff_j · |Oc_j|·conj(Oc_j) · support / (|Oc_j|² + delta1)``
      — everything except the 1/max|O| factor, which the caller applies
      after the object consensus (a scalar divide commutes with psum),
    * ``mets_out`` — (data-residual, update-norm) partial sums.
    """
    n, b = np_size, bbox
    # Ref layout: amp2d, sup, pupil (input-only here), *mats, o_block,
    # then the outputs d, v, mets.
    amp_ref, sup_ref, pup_ref = refs[0], refs[1], refs[2]
    mats = refs[3:3 + n_mats]
    o_ref = refs[3 + n_mats]
    d_ref = refs[3 + n_mats + 1]
    v_ref = refs[3 + n_mats + 2]
    mets_ref = refs[3 + n_mats + 3]
    p_r = pup_ref[0]
    p_i = pup_ref[1]

    offs, oc_r, oc_i, d_r, d_i, img_r, img_i = _batched_chunk_forward(
        o_ref, p_r, p_i, amp_ref[...], starts_ref, 0, mats,
        chunk=chunk, np_size=n, bbox=b, bbox_lo=bbox_lo, win=win,
        lane_blk=lane_blk, eps=eps, dft_precision=dft_precision,
    )

    d_ref[...] = jnp.zeros_like(d_ref)

    pabs2 = p_r * p_r + p_i * p_i
    pabs = jnp.sqrt(pabs2)
    pmax = jnp.sqrt(jnp.max(pabs2))
    recip_o = 1.0 / (pmax * (pabs2 + delta2))
    wr = pabs * p_r * recip_o
    wi = -pabs * p_i * recip_o
    upd = jnp.zeros((), jnp.float32)
    for j in range(chunk):
        do_r = d_r[j] * wr - d_i[j] * wi
        do_i = d_r[j] * wi + d_i[j] * wr
        if collect_metrics:
            vm = valid_ref[j].astype(jnp.float32)
            upd = upd + vm * jnp.sum(do_r * do_r + do_i * do_i)

        @pl.when(valid_ref[j] > 0)
        def _add(do_r=do_r, do_i=do_i, off=offs[j]):
            _window_add(d_ref, off[0], off[1], off[2], off[3],
                        do_r, do_i, b, win, lane_blk)

    sup = sup_ref[...]
    acc_r = jnp.zeros((b, b), jnp.float32)
    acc_i = jnp.zeros((b, b), jnp.float32)
    for j in range(chunk):
        oabs2 = oc_r[j] * oc_r[j] + oc_i[j] * oc_i[j]
        oabs = jnp.sqrt(oabs2)
        recip_p = 1.0 / (oabs2 + delta1)
        vr = oabs * oc_r[j] * recip_p * sup
        vi = -oabs * oc_i[j] * recip_p * sup
        vm = valid_ref[j].astype(jnp.float32)
        acc_r = acc_r + vm * (d_r[j] * vr - d_i[j] * vi)
        acc_i = acc_i + vm * (d_r[j] * vi + d_i[j] * vr)
    v_ref[0] = acc_r
    v_ref[1] = acc_i

    if collect_metrics:
        # data residual Σ m·(A − |img|)², rows grouped per LED
        np8 = _round_up(n, 8)
        absimg = jnp.sqrt(img_r * img_r + img_i * img_i)
        amp2d = amp_ref[...]
        resid = jnp.zeros((), jnp.float32)
        for j in range(chunk):
            rows = slice(j * np8, (j + 1) * np8)
            vm = valid_ref[j].astype(jnp.float32)
            term = amp2d[rows, :] - absimg[rows, :]
            resid = resid + vm * jnp.sum(term * term)
        mets_ref[0] = resid
        mets_ref[1] = upd
    else:
        mets_ref[0] = jnp.zeros((), jnp.float32)
        mets_ref[1] = upd


@functools.partial(
    jax.jit,
    static_argnames=(
        "np_size", "n_rows", "n_cols", "delta1", "delta2", "eps", "interpret",
        "dft_precision", "pupil_radius", "collect_metrics", "vma",
    ),
)
def fused_chunk_increments(
    o_planes,       # (2, R, Ncols) f32: this device's spectrum block, centered frame
    p_planes,       # (2, Np, Np) f32, DC-at-corner frame
    support,        # (Np, Np) f32, DC-at-corner frame
    amps,           # (C, Np, Np) f32: this device's chunk slice
    starts_flat,    # (2C,) int32 patch starts, relative to the block
    valid,          # (C,) int32
    *,
    np_size: int,
    n_rows: int,
    n_cols: int,
    delta1: float,
    delta2: float,
    eps: float,
    interpret: bool = False,
    dft_precision: str = "bf16x3",
    pupil_radius: int = 0,
    collect_metrics: bool = True,
    vma: tuple = (),
):
    """One Jacobi chunk's local increments (the sharded per-device body).

    ``vma`` declares which mesh axes the outputs vary over when called
    under ``jax.shard_map`` (shard_map's vma checking requires explicit
    output annotations for custom calls): the union of the operands'
    varying axes — ``("led",)`` for the replicated-spectrum body,
    ``("led", "tile")`` for the halo-extended tile body.

    Returns ``(d_planes, v_planes, mets)``: object increments (same block
    shape as ``o_planes``), the pupil numerator sum in the solver's
    DC-at-corner frame (divide by the post-consensus ``max|O|`` and psum —
    scalar divide commutes with psum), and (residual, update-norm) partials.
    Generic over the block row count so it serves both the replicated
    spectrum (parallel/led_shard.py) and the halo-extended tile block
    (parallel/tile_shard.py).
    """
    if dft_precision not in ("bf16x3", "highest"):
        raise ValueError(
            f"dft_precision must be 'bf16x3' or 'highest', got {dft_precision!r}"
        )
    c = amps.shape[0]
    if not interpret and c * _round_up(np_size, 8) > _CHUNK_ROWS_LIMIT:
        raise ValueError(
            f"per-device chunk of {c} LEDs at Np={np_size} exceeds the fused "
            f"chunk-increments kernel's compile ceiling "
            f"({c * _round_up(np_size, 8)} stacked rows > {_CHUNK_ROWS_LIMIT}); "
            f"use chunk_size <= {max_pallas_chunk(np_size)} or more devices"
        )
    n = np_size
    b, lo = _support_bbox(n, pupil_radius)
    np8 = _round_up(n, 8)
    nl = _round_up(n, 128)
    win = _round_up(b + 8, 8)
    lane_blk = _round_up(b, 128) + 128
    max_off = n_rows - n + lo
    lanes = max(_round_up(n_cols, 128), (max_off // 128) * 128 + lane_blk)
    rows_pad = max(_round_up(n_rows, 8), (max_off // 8) * 8 + win)
    f32 = jnp.float32

    mats = [jnp.asarray(m) for m in _block_dft_mats(n, b, lo, dft_precision)]
    n_mats = len(mats)

    half = n // 2
    bsel = min(b, n - lo)
    pad_b = ((0, 0), (0, b - bsel), (0, b - bsel))
    p_centered = jnp.pad(
        jnp.roll(p_planes, (half, half), axis=(1, 2))[:, lo:lo + bsel, lo:lo + bsel],
        pad_b,
    )
    sup_centered = jnp.pad(
        jnp.roll(support, (half, half), axis=(0, 1))[lo:lo + bsel, lo:lo + bsel],
        pad_b[1:],
    )

    o_padded = jnp.pad(
        o_planes, ((0, 0), (0, rows_pad - n_rows), (0, lanes - n_cols))
    )
    amps_p = jnp.pad(
        amps, ((0, 0), (0, np8 - n), (0, nl - n))
    ).reshape(c * np8, nl)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 + n_mats + 1),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
    )
    kernel = functools.partial(
        _chunk_inc_kernel, chunk=c, np_size=n, bbox=b, bbox_lo=lo, win=win,
        lane_blk=lane_blk, n_mats=n_mats,
        delta1=delta1, delta2=delta2, eps=eps,
        dft_precision=dft_precision, collect_metrics=collect_metrics,
    )
    sd_kw = {"vma": frozenset(vma)} if vma else {}
    d_out, v_out, mets = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((2, rows_pad, lanes), f32, **sd_kw),
            jax.ShapeDtypeStruct((2, b, b), f32, **sd_kw),
            jax.ShapeDtypeStruct((2,), f32, **sd_kw),
        ),
        interpret=interpret,
    )(starts_flat, valid, amps_p, sup_centered, p_centered, *mats, o_padded)

    v_full = jnp.zeros((2, n, n), f32)
    v_full = jax.lax.dynamic_update_slice(
        v_full, v_out[:, :bsel, :bsel], (0, lo, lo)
    )
    v_corner = jnp.roll(v_full, (-half, -half), axis=(1, 2))
    return d_out[:, :n_rows, :n_cols], v_corner, mets


@functools.partial(
    jax.jit,
    static_argnames=(
        "np_size", "n_large", "delta1", "delta2", "eps", "interpret",
        "dft_precision", "pupil_radius", "global_max", "collect_metrics",
        "ablate",
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
    collect_metrics: bool = False,
    ablate: str = "",
):
    """One full sequential EPRY sweep as a single fused Pallas kernel.

    Numerically equivalent to ``models.epry.sweep_sequential`` (validated in
    tests; ``dft_precision='highest'`` matches to f32 round-off, the default
    ``'bf16x3'`` to ~1e-6 relative — see :func:`_mm_fns` — at ~2× the MXU
    throughput). ``pupil_radius`` (geometry.pupil_radius) enables the exact
    pupil-support bbox restriction; 0 disables it. ``global_max='lazy'``
    freezes max|O| at its sweep-start value (same deviation as the XLA
    path). ``ablate`` disables kernel stages for benchmark time attribution
    (benchmarks/ablate.py) — output is garbage unless empty.

    Returns ``(o_planes, p_planes, mets)``; ``mets`` is the per-sweep
    (data-residual, update-norm) pair accumulated across LEDs in-kernel
    when ``collect_metrics`` (zeros otherwise).
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
    np8 = _round_up(n, 8)
    nl = _round_up(n, 128)
    win = _round_up(b + 8, 8)
    lane_blk = _round_up(b, 128) + 128
    # Static bounds: window starts satisfy ys, xs ∈ [lo, Nlarge - n + lo],
    # and the aligned (win, lane_blk) window may extend past them.
    max_off = n_large - n + lo
    lanes = max(_round_up(n_large, 128), (max_off // 128) * 128 + lane_blk)
    rows_pad = max(_round_up(n_large, 8), (max_off // 8) * 8 + win)
    f32 = jnp.float32

    mats = [jnp.asarray(m) for m in _block_dft_mats(n, b, lo, dft_precision)]
    n_mats = len(mats)

    # Kernel-side pupil/support live in the centered frame, bbox-cropped;
    # when lo + b spills past the patch (only without the NA restriction)
    # the spill is zero-padded — those rows can never gain energy.
    half = n // 2
    bsel = min(b, n - lo)
    pad_b = ((0, 0), (0, b - bsel), (0, b - bsel))
    p_centered = jnp.pad(
        jnp.roll(p_planes, (half, half), axis=(1, 2))[:, lo:lo + bsel, lo:lo + bsel],
        pad_b,
    )
    sup_centered = jnp.pad(
        jnp.roll(support, (half, half), axis=(0, 1))[lo:lo + bsel, lo:lo + bsel],
        pad_b[1:],
    )

    o_padded = jnp.pad(
        o_planes, ((0, 0), (0, rows_pad - n_large), (0, lanes - n_large))
    )
    # Amplitude frames zero-padded to the kernel's padded image-plane shape.
    amps_p = jnp.pad(amps, ((0, 0), (0, np8 - n), (0, nl - n)))

    if global_max == "exact" and ablate != "omax-const":
        scratch = [pltpu.VMEM((rows_pad, 128), f32)]   # per-row lane-folded max|O|²
    else:
        scratch = [pltpu.SMEM((1, 1), f32)]            # frozen sweep-start max|O|²

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, np8, nl), lambda i, s: (i, 0, 0)),  # amps per-LED
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + n_mats + 2),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=scratch,
    )

    kernel = functools.partial(
        _sweep_kernel, np_size=n, bbox=b, bbox_lo=lo, win=win,
        lane_blk=lane_blk, n_mats=n_mats,
        delta1=delta1, delta2=delta2, eps=eps, dft_precision=dft_precision,
        global_max=global_max, collect_metrics=collect_metrics,
        ablate=ablate,
    )
    o_out, p_out, mets = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((2, rows_pad, lanes), f32),
            jax.ShapeDtypeStruct((2, b, b), f32),
            jax.ShapeDtypeStruct((2,), f32),
        ),
        input_output_aliases={3 + n_mats: 0, 4 + n_mats: 1},  # o, p
        interpret=interpret,
    )(starts_flat, amps_p, sup_centered, *mats, o_padded, p_centered)

    # Back to solver conventions: trim padding, un-crop the pupil bbox,
    # pupil to corner frame.
    p_full = jnp.zeros((2, n, n), f32)
    p_full = jax.lax.dynamic_update_slice(
        p_full, p_out[:, :bsel, :bsel], (0, lo, lo)
    )
    p_corner = jnp.roll(p_full, (-half, -half), axis=(1, 2))
    return o_out[:, :n_large, :n_large], p_corner, mets
