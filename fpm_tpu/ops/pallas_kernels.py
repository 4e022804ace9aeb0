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
* The large object spectrum (real/imag planes) stays **resident in VMEM**
  for the whole sweep via input/output aliasing — zero HBM traffic for the
  spectrum between LEDs. (Fits comfortably: Nlarge=600 → 2.9 MB of 16 MB;
  the tile-sharded path covers spectra beyond VMEM.)
* The per-LED 2D FFT/IFFT run on the **MXU** as complex DFT matmuls
  (4 real matmuls each) with the DFT matrices held in VMEM.
* The per-LED global ``max|O|`` (the reference's full-spectrum
  ``cv::minMaxLoc``, fpmMain.cpp:467) is a VPU reduction over the
  VMEM-resident spectrum — exact semantics at on-chip bandwidth.

Everything is float32 planes (complex never materializes), matching the
solver's real-boundary convention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fft import _dft_matrix_np


def _cmatmul(ar, ai, br, bi):
    """(ar+i·ai) @ (br+i·bi) as four real MXU matmuls."""
    rr = jnp.dot(ar, br, preferred_element_type=jnp.float32) - jnp.dot(
        ai, bi, preferred_element_type=jnp.float32
    )
    ri = jnp.dot(ar, bi, preferred_element_type=jnp.float32) + jnp.dot(
        ai, br, preferred_element_type=jnp.float32
    )
    return rr, ri


def _fft2_planes(zr, zi, fr, fi):
    """2D DFT via F @ z @ F (symmetric F, so no transposes)."""
    tr, ti = _cmatmul(fr, fi, zr, zi)
    return _cmatmul(tr, ti, fr, fi)


def _shift2(x, h):
    """fftshift for even sizes: roll by half along both axes."""
    return pltpu.roll(pltpu.roll(x, h, 0), h, 1)


def _sweep_kernel(
    # scalar prefetch
    starts_ref,
    # inputs (blocked / full)
    amp_ref, sup_ref, fwd_r_ref, fwd_i_ref, inv_r_ref, inv_i_ref,
    o_in_ref, p_in_ref,
    # outputs (aliased)
    o_ref, p_ref,
    *, np_size: int, delta1: float, delta2: float, eps: float,
):
    k = pl.program_id(0)
    n = np_size
    h = n // 2

    ys = starts_ref[2 * k]
    xs = starts_ref[2 * k + 1]

    # --- crop the centered-frame patch; to corner frame (fpmMain.cpp:358-362)
    pc_r = o_ref[0, pl.ds(ys, n), pl.ds(xs, n)]
    pc_i = o_ref[1, pl.ds(ys, n), pl.ds(xs, n)]
    oc_r = _shift2(pc_r, h)
    oc_i = _shift2(pc_i, h)

    # --- apply pupil (fpmMain.cpp:364)
    p_r = p_ref[0]
    p_i = p_ref[1]
    ocp_r = oc_r * p_r - oc_i * p_i
    ocp_i = oc_r * p_i + oc_i * p_r

    # --- to image plane: IFFT as MXU matmul-DFT (fpmMain.cpp:365)
    img_r, img_i = _fft2_planes(ocp_r, ocp_i, inv_r_ref[...], inv_i_ref[...])

    # --- amplitude replacement preserving phase (fpmMain.cpp:377-394);
    #     eps on the real part only, as the reference's scalar cv::add.
    amp = amp_ref[0]
    mag = jnp.sqrt((img_r + eps) ** 2 + img_i**2)
    scale = amp / mag
    rep_r = img_r * scale
    rep_i = img_i * scale

    # --- back to Fourier plane (fpmMain.cpp:394)
    up_r, up_i = _fft2_planes(rep_r, rep_i, fwd_r_ref[...], fwd_i_ref[...])
    d_r = up_r - ocp_r
    d_i = up_i - ocp_i

    # --- object update (fpmMain.cpp:404-447):
    #     ΔO = diff · |P| · conj(P) / (max|P| · (|P|² + delta2))
    pabs2 = p_r * p_r + p_i * p_i
    pabs = jnp.sqrt(pabs2)
    pmax = jnp.sqrt(jnp.max(pabs2))
    denom_o = pmax * (pabs2 + delta2)
    wr = pabs * p_r / denom_o    # Re of |P|·conj(P)/denom
    wi = -pabs * p_i / denom_o   # Im (conjugate)
    do_r = d_r * wr - d_i * wi
    do_i = d_r * wi + d_i * wr
    do_r = _shift2(do_r, h)
    do_i = _shift2(do_i, h)
    o_ref[0, pl.ds(ys, n), pl.ds(xs, n)] = pc_r + do_r
    o_ref[1, pl.ds(ys, n), pl.ds(xs, n)] = pc_i + do_i

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
    jax.jit, static_argnames=("np_size", "n_large", "delta1", "delta2", "eps", "interpret")
)
def fused_epry_sweep(
    o_planes,       # (2, Nlarge, Nlarge) f32
    p_planes,       # (2, Np, Np) f32
    support,        # (Np, Np) f32
    amps,           # (K, Np, Np) f32, schedule order
    starts_flat,    # (2K,) int32: [y0, x0, y1, x1, ...]
    *,
    np_size: int,
    n_large: int,
    delta1: float,
    delta2: float,
    eps: float,
    interpret: bool = False,
):
    """One full sequential EPRY sweep as a single fused Pallas kernel."""
    k = amps.shape[0]
    n = np_size
    fwd = _dft_matrix_np(n, False, "complex64")
    inv = _dft_matrix_np(n, True, "complex64")
    f32 = jnp.float32
    consts = [
        jnp.asarray(m, f32)
        for m in (fwd.real, fwd.imag, inv.real, inv.imag)
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda i, s: (i, 0, 0)),        # amps: per-LED block
            pl.BlockSpec(memory_space=pltpu.VMEM),                  # support
            pl.BlockSpec(memory_space=pltpu.VMEM),                  # fwd_r
            pl.BlockSpec(memory_space=pltpu.VMEM),                  # fwd_i
            pl.BlockSpec(memory_space=pltpu.VMEM),                  # inv_r
            pl.BlockSpec(memory_space=pltpu.VMEM),                  # inv_i
            pl.BlockSpec(memory_space=pltpu.VMEM),                  # o_in (aliased)
            pl.BlockSpec(memory_space=pltpu.VMEM),                  # p_in (aliased)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),                  # o_out
            pl.BlockSpec(memory_space=pltpu.VMEM),                  # p_out
        ),
    )

    kernel = functools.partial(
        _sweep_kernel, np_size=n, delta1=delta1, delta2=delta2, eps=eps
    )
    o_out, p_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((2, n_large, n_large), f32),
            jax.ShapeDtypeStruct((2, n, n), f32),
        ),
        input_output_aliases={7: 0, 8: 1},  # o_in→o_out, p_in→p_out
        interpret=interpret,
    )(starts_flat, amps, support, *consts, o_planes, p_planes)
    return o_out, p_out
