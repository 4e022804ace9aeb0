"""TPU-native EPRY (embedded pupil recovery) phase-retrieval solver.

Functional re-design of the reference's ``runFPM`` (fpmMain.cpp:274-498):

* The large object spectrum ``O`` lives permanently in the **centered**
  (DC-in-middle) frame, so the per-LED work is a dynamic patch slice + two
  patch-size rolls instead of the reference's two full-spectrum fftShifts per
  LED (fpmMain.cpp:358-362, 427-447) — its dominant memory traffic.
* The whole iteration is one jit-compiled program: ``lax.scan`` over the
  NA-ascending LED schedule (exact Gauss–Seidel semantics of
  fpmMain.cpp:348-476), ``lax.fori_loop`` over sweeps; buffers are donated so
  updates happen in place in HBM. The reference instead allocates ~97k
  temporary Mats per run and round-trips host↔device every LED
  (``getMat(ACCESS_RW)``, fpmMain.cpp:380-381; SURVEY.md §6).
* ~60% of the reference's runtime is unfused element-wise complex arithmetic
  (complexMultiply/Abs/Divide, BASELINE.md); here each LED step is a single
  fused XLA computation (optionally routed through the Pallas kernels in
  :mod:`fpm_tpu.ops.pallas_kernels`), and the small per-LED FFTs can run as
  MXU matmul-DFTs (:mod:`fpm_tpu.ops.fft`).

Two sweep modes:

* ``sequential`` — bit-faithful Gauss–Seidel LED ordering; the accuracy/parity
  mode (validated against :mod:`fpm_tpu.oracle`).
* ``batched`` — chunked Gauss–Seidel-over-Jacobi sweep: the NA-sorted
  schedule is split into ``ceil(K / chunk_size)`` chunks processed
  sequentially; *within* a chunk every LED update is computed from the
  chunk-start state and summed (Jacobi). The chunk axis is what shards over
  devices (SURVEY.md N1) — the reference's loop is unparallelizable because
  each LED mutates shared state (fpmMain.cpp:348). Measured convergence
  (benchmarks/convergence.py, mono dome problems, aberrated pupil):

  - whole-sweep Jacobi (``chunk_size=0``) **diverges/oscillates at the
    reference's realistic LED counts** (K=193: RMSE stuck ~0.10 vs
    sequential 0.014; overlap-normalized and down-scaled variants stagnate);
  - contiguous chunks are stable only up to ~12 LEDs/chunk (NA-adjacent
    LEDs overlap maximally in k-space);
  - ``chunk_assign='strided'`` (chunk c takes LEDs {c, c+n_chunks, ...} of
    the NA-sorted schedule, spreading each chunk across the NA range) is
    stable up to chunk_size=96 at K=193–506 and matches or beats sequential
    RMSE within ~2 extra sweeps. Stability needs the stride (= n_chunks) to
    stay ≥ 4: chunk_size=128 at K=193 (stride 2) oscillates. Recommended:
    ``chunk_size=32`` strided (convergence) up to 96 (throughput).

The per-LED global ``max|O|`` pupil-update denominator (fpmMain.cpp:467) is a
full-spectrum reduction; ``global_max='exact'`` reproduces it, ``'lazy'``
refreshes it once per sweep (documented deviation, far less HBM traffic).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FPMConfig
from ..geometry import LEDGeometry, pupil_support
from ..ops import crop_patch, fft2, fftshift2d, ifft2, ifftshift2d, paste_patch_add


@dataclasses.dataclass(frozen=True)
class EPRYOptions:
    """Static solver options (hashable → usable as a jit static argument)."""

    np_size: int
    iterations: int
    delta1: float
    delta2: float
    eps: float
    mode: str = "sequential"          # "sequential" | "batched"
    global_max: str = "exact"         # "exact" | "lazy"
    pupil_step_scale: float = 1.0     # batched-mode pupil update scaling
    chunk_size: int = 0               # batched mode: LEDs per Jacobi chunk
    #                                   (0 = whole sweep — unstable at K≳100)
    chunk_assign: str = "strided"     # "strided" | "contiguous" chunk makeup
    collect_metrics: bool = True
    use_pallas: bool = False          # route fused element-wise math via Pallas
    dft_precision: str = "bf16x3"     # Pallas DFT matmuls: "bf16x3" | "highest"
    pupil_radius: int = 0             # NA-disk radius px; enables the exact
    #                                   pupil-support bbox in the Pallas kernel
    n_large: int = 0
    dtype: str = "complex64"          # on-device complex dtype
    comm_precision: str = "f32"       # sharded-sweep consensus payloads:
    #                                   "f32" | "bf16" (halves every psum /
    #                                   reverse-halo payload; Pallas bodies)
    stale_consensus: bool = False     # one-chunk-stale consensus pipelining
    #                                   (chunk c+1's increments computed
    #                                   before chunk c's psum lands, so XLA
    #                                   overlaps the all-reduce with compute)

    def __post_init__(self):
        if self.mode not in ("sequential", "batched"):
            raise ValueError(f"mode must be 'sequential' or 'batched', got {self.mode!r}")
        if self.global_max not in ("exact", "lazy"):
            raise ValueError(f"global_max must be 'exact' or 'lazy', got {self.global_max!r}")
        if self.dft_precision not in ("bf16x3", "highest"):
            raise ValueError(
                f"dft_precision must be 'bf16x3' or 'highest', got {self.dft_precision!r}"
            )
        if self.chunk_assign not in ("strided", "contiguous"):
            raise ValueError(
                f"chunk_assign must be 'strided' or 'contiguous', got {self.chunk_assign!r}"
            )
        if self.chunk_size < 0:
            raise ValueError(f"chunk_size must be >= 0, got {self.chunk_size}")
        if self.comm_precision not in ("f32", "bf16"):
            raise ValueError(
                f"comm_precision must be 'f32' or 'bf16', got {self.comm_precision!r}"
            )
        if self.comm_precision == "bf16" and not self.use_pallas:
            raise ValueError(
                "comm_precision='bf16' requires the Pallas (f32-planes) "
                "sharded bodies; the XLA complex parity path keeps full-"
                "precision consensus"
            )

    @classmethod
    def from_config(cls, cfg: FPMConfig, **overrides) -> "EPRYOptions":
        from ..geometry import pupil_radius

        kwargs = dict(
            np_size=cfg.np_size,
            iterations=cfg.iterations,
            delta1=cfg.delta1,
            delta2=cfg.delta2,
            eps=cfg.eps,
            n_large=cfg.n_large,
            dtype=cfg.dtype,
            pupil_radius=pupil_radius(cfg),
        )
        kwargs.update(overrides)
        return cls(**kwargs)

    @property
    def cdtype(self):
        return jnp.dtype(self.dtype)

    @property
    def rdtype(self):
        return jnp.dtype("float64" if self.dtype == "complex128" else "float32")


@dataclasses.dataclass
class ReconResult:
    obj_crop: np.ndarray       # high-res complex object, real space
    obj_f_centered: np.ndarray # high-res spectrum, centered frame
    pupil: np.ndarray          # recovered pupil, DC-at-corner frame
    metrics: dict[str, np.ndarray]

    @property
    def obj_f(self) -> np.ndarray:
        """Spectrum in the reference's DC-at-corner frame (fpmMain.h:92)."""
        return np.fft.ifftshift(self.obj_f_centered)


# --------------------------------------------------------------------------- init


def init_traced(amps_sorted: jax.Array, support_r: jax.Array, opts: EPRYOptions):
    """Initial (O_centered, pupil) per the reference contract (traceable).

    Pupil: fftshifted filled NA circle (fpmMain.cpp:301-313). Object
    spectrum: amplitude of the *second*-lowest-NA image (``sortedIndicies
    .at(1)`` — SURVEY.md quirk 2), FFT'd, masked by the pupil support, pasted
    at the center of the large zeros (fpmMain.cpp:315-343).

    ``amps_sorted`` is the (K, Np, Np) amplitude stack already in schedule
    order, so the seed image is simply index 1. ``support_r`` is the real
    binary pupil support (DC-at-corner). All inputs are real so this can sit
    directly at a jit boundary (complex buffers never cross host↔device —
    some TPU transfer paths don't implement complex element types).
    """
    dtype = opts.cdtype
    n_large, np_sz = opts.n_large, opts.np_size
    support = support_r.astype(dtype)
    pupil = support

    seed_idx = 1 if amps_sorted.shape[0] > 1 else 0
    amp0 = amps_sorted[seed_idx].astype(dtype)
    ci = fftshift2d(fft2(amp0) * support)

    obj_f = jnp.zeros((n_large, n_large), dtype=dtype)
    half_l, half_n = n_large // 2, np_sz // 2
    obj_f = jax.lax.dynamic_update_slice(obj_f, ci, (half_l - half_n, half_l - half_n))
    return obj_f, pupil


def init_state(cfg: FPMConfig, geom: LEDGeometry, amps_sorted: jax.Array, dtype=jnp.complex64):
    """Convenience init returning (O, pupil, support) device arrays.

    Used by the CPU-mesh sharded paths and tests; the single-device TPU path
    runs :func:`init_traced` inside the jitted program instead.
    """
    opts = EPRYOptions.from_config(cfg, dtype=jnp.dtype(dtype).name)
    support_r = jnp.asarray(pupil_support(cfg, centered=False), dtype=opts.rdtype)
    obj_f, pupil = init_traced(jnp.asarray(amps_sorted, opts.rdtype), support_r, opts)
    return obj_f, jnp.copy(pupil), support_r.astype(opts.cdtype)


# ---------------------------------------------------------------------- LED step


def _amp_replace(obj_crop_p, amp, eps):
    """Phase-preserving amplitude replacement (fpmMain.cpp:377-394).

    ``eps`` is added to BOTH the real and imaginary channels: OpenCV's
    ``cv::add(mat2ch, double)`` unrolls a 1-element scalar across every
    channel (verified empirically against this rig's OpenCV 4.6 via
    native/refshim/cv_probe.cpp, and end-to-end against the compiled
    reference binary in tests/test_reference_binary.py).
    """
    return obj_crop_p / jnp.abs(obj_crop_p + eps * (1 + 1j)) * amp


def _object_delta(diff, pupil, delta2):
    """Quasi-Newton object update increment (fpmMain.cpp:404-419).

    ``ΔO = (|P| · conj(P) · diff) / (max|P| · (|P|² + delta2))``
    """
    pabs = jnp.abs(pupil)
    pmax = jnp.max(pabs)
    return diff * (pabs * jnp.conj(pupil)) / (pmax * (pabs * pabs + delta2))


def _pupil_delta(diff, objf_crop, objf_abs_max, support, delta1):
    """EPRY pupil update increment (fpmMain.cpp:457-472).

    ``ΔP = (|Oc| · conj(Oc) · diff) / (max|O| · (|Oc|² + delta1)) · support``
    where ``max|O|`` is over the full (already-updated) large spectrum.
    """
    oabs = jnp.abs(objf_crop)
    return diff * (oabs * jnp.conj(objf_crop)) / (
        objf_abs_max * (oabs * oabs + delta1)
    ) * support


def led_step(carry, inputs, *, support, opts: EPRYOptions):
    """One Gauss–Seidel LED update: (O, P, omax) × (amp, start) → (O, P, omax).

    The exact per-LED contract of fpmMain.cpp:348-476 in the centered-O frame.
    """
    obj_f, pupil, omax_lazy = carry
    amp, start = inputs
    np_sz = opts.np_size

    patch_c = crop_patch(obj_f, start, np_sz)
    objf_crop = fftshift2d(patch_c)          # centered → corner frame (even N)
    objf_crop_p = objf_crop * pupil
    obj_crop_p = ifft2(objf_crop_p)

    objf_up = fft2(_amp_replace(obj_crop_p, amp, opts.eps))
    diff = objf_up - objf_crop_p

    d_obj = _object_delta(diff, pupil, opts.delta2)
    obj_f = paste_patch_add(obj_f, fftshift2d(d_obj), start)

    if opts.global_max == "exact":
        # The reference recomputes max|objF| after every object update
        # (fpmMain.cpp:460,467) — a full-spectrum reduction per LED.
        omax = jnp.max(jnp.abs(obj_f))
    else:
        omax = omax_lazy

    d_pupil = _pupil_delta(diff, objf_crop, omax, support, opts.delta1)
    pupil = pupil + d_pupil

    if opts.collect_metrics:
        resid = jnp.sum((amp - jnp.abs(obj_crop_p)) ** 2)
        upd = jnp.sum(jnp.abs(d_obj) ** 2)
        out = jnp.stack([resid, upd])
    else:
        out = jnp.zeros((2,), dtype=jnp.abs(diff).dtype)
    return (obj_f, pupil, omax_lazy), out


# ------------------------------------------------------------------------ sweeps


def sweep_sequential(obj_f, pupil, amps, starts, *, support, opts: EPRYOptions):
    """One full NA-ascending sequential sweep over all LEDs (lax.scan)."""
    omax0 = jnp.max(jnp.abs(obj_f))
    step = functools.partial(led_step, support=support, opts=opts)
    (obj_f, pupil, _), per_led = jax.lax.scan(step, (obj_f, pupil, omax0), (amps, starts))
    return obj_f, pupil, per_led.sum(axis=0)


def sweep_pallas(obj_f, pupil, amps, starts, *, support, opts: EPRYOptions):
    """Sequential sweep routed through the fused Pallas mega-kernel.

    Equivalent to :func:`sweep_sequential` with the matching ``global_max``
    mode (fpm_tpu/ops/pallas_kernels.py); per-sweep (residual, update-norm)
    metrics are accumulated in-kernel when ``opts.collect_metrics``.
    ``opts.pupil_radius`` enables the exact pupil-support bbox restriction
    inside the kernel.
    """
    import jax as _jax

    from ..ops.pallas_kernels import fused_epry_sweep

    o_planes = jnp.stack([jnp.real(obj_f), jnp.imag(obj_f)]).astype(jnp.float32)
    p_planes = jnp.stack([jnp.real(pupil), jnp.imag(pupil)]).astype(jnp.float32)
    support_r = jnp.real(support).astype(jnp.float32)
    o_out, p_out, mets = fused_epry_sweep(
        o_planes, p_planes, support_r,
        amps.astype(jnp.float32), starts.reshape(-1),
        np_size=opts.np_size, n_large=opts.n_large,
        delta1=opts.delta1, delta2=opts.delta2, eps=opts.eps,
        interpret=_jax.default_backend() != "tpu",
        dft_precision=opts.dft_precision,
        pupil_radius=opts.pupil_radius,
        global_max=opts.global_max,
        collect_metrics=opts.collect_metrics,
    )
    obj_f = (o_out[0] + 1j * o_out[1]).astype(obj_f.dtype)
    pupil = (p_out[0] + 1j * p_out[1]).astype(pupil.dtype)
    return obj_f, pupil, mets.astype(amps.dtype)


def sweep_batched_pallas(obj_f, pupil, amps_it, starts_it, mask, *, support,
                         opts: EPRYOptions):
    """Chunked Gauss–Seidel-over-Jacobi sweep via the fused chunked kernel.

    Equivalent to :func:`sweep_batched` (ops/pallas_kernels.py
    ``fused_epry_chunked`` batches each chunk's LEDs onto the MXU); inputs
    are the pre-chunked (n_chunks, C, ...) arrays. Per-sweep (residual,
    update-norm) metrics are accumulated in-kernel when
    ``opts.collect_metrics``.
    """
    import jax as _jax

    from ..ops.pallas_kernels import fused_epry_chunked

    o_planes = jnp.stack([jnp.real(obj_f), jnp.imag(obj_f)]).astype(jnp.float32)
    p_planes = jnp.stack([jnp.real(pupil), jnp.imag(pupil)]).astype(jnp.float32)
    support_r = jnp.real(support).astype(jnp.float32)
    o_out, p_out, mets = fused_epry_chunked(
        o_planes, p_planes, support_r,
        amps_it.astype(jnp.float32),
        starts_it.reshape(-1).astype(jnp.int32),
        (mask > 0).reshape(-1).astype(jnp.int32),
        np_size=opts.np_size, n_large=opts.n_large,
        delta1=opts.delta1, delta2=opts.delta2, eps=opts.eps,
        interpret=_jax.default_backend() != "tpu",
        dft_precision=opts.dft_precision,
        pupil_radius=opts.pupil_radius,
        pupil_step_scale=opts.pupil_step_scale,
        collect_metrics=opts.collect_metrics,
    )
    obj_f = (o_out[0] + 1j * o_out[1]).astype(obj_f.dtype)
    pupil = (p_out[0] + 1j * p_out[1]).astype(pupil.dtype)
    return obj_f, pupil, mets.astype(amps_it.dtype)


def effective_chunk_size(np_size: int, chunk_size: int, k: int,
                         use_pallas: bool, mode: str, n_led: int = 1) -> int:
    """The chunk size that will actually run, on every solver path.

    The single source of truth for chunk clamping, used by
    :func:`reconstruct`, ``parallel.led_shard.reconstruct_led_sharded``,
    ``parallel.tile_shard.reconstruct_tile_sharded`` AND the CLI's
    provenance fingerprint — provenance must record what executed, or a
    later ``--resume`` under the recorded options silently follows a
    different trajectory (the exact failure the fingerprint exists to
    prevent).

    Two transformations can move the request:

    * Pallas compile ceiling: the fused chunked kernel has an empirically
      calibrated Mosaic limit on stacked rows per chunk
      (ops/pallas_kernels.py ``_CHUNK_ROWS_LIMIT``); requests beyond it are
      clamped rather than crashing remote compilation. On an LED-sharded
      mesh the per-device slice is ``chunk/n_led``, so the global cap is
      ``max_pallas_chunk(np) * n_led``. Clamping never hurts convergence —
      smaller chunks are strictly closer to the sequential Gauss–Seidel
      trajectory (module docstring).
    * LED-shard divisibility: ``reconstruct_led_sharded`` rounds the chunk
      UP to a multiple of ``n_led`` so every device gets an equal slice
      (padded with masked dummies), on the XLA and Pallas paths alike.

    Sequential mode passes through unchanged (``chunk_size`` is unused
    there); so does the single-device XLA batched path (``chunk_schedule``
    accepts any positive chunk as-is).
    """
    if mode != "batched":
        return chunk_size
    eff = chunk_size if chunk_size > 0 else k
    if use_pallas:
        from ..ops.pallas_kernels import max_pallas_chunk

        cap = max_pallas_chunk(np_size) * n_led
        eff = min(eff, cap, k) if n_led == 1 else min(eff, cap)
    elif n_led == 1:
        return chunk_size
    if n_led > 1:
        eff = -(-eff // n_led) * n_led
    return eff


def chunk_schedule(k: int, chunk_size: int, assign: str) -> tuple[np.ndarray, np.ndarray, int]:
    """Static chunking of a K-LED schedule: (perm, mask, n_chunks).

    ``perm`` (n_chunks·C,) indexes into the padded NA-sorted schedule
    (indices ≥ k address masked dummy frames); ``mask`` is 1.0 for real
    LEDs. ``assign='strided'`` gives chunk c the LEDs {c, c+n_chunks, ...}
    so each chunk spans the NA range (minimal within-chunk sub-aperture
    overlap — the measured stability condition, see module docstring);
    ``'contiguous'`` keeps consecutive NA-sorted runs.
    """
    c = chunk_size if chunk_size > 0 else k
    n_chunks = -(-k // c)
    total = n_chunks * c
    if assign == "strided" and n_chunks > 1:
        perm = np.arange(total).reshape(c, n_chunks).T.ravel()
    else:
        perm = np.arange(total)
    mask = (perm < k).astype(np.float32)
    return perm, mask, n_chunks


def jacobi_chunk(obj_f, pupil, amps, starts, mask, *, support, opts: EPRYOptions):
    """One Jacobi chunk: every LED update from the chunk-start state.

    All per-LED quantities are computed batched (one MXU-batched FFT over
    the LED axis), the object-spectrum increments are accumulated with a
    cheap paste scan, and the pupil increments are summed. ``mask`` zeroes
    padded dummy frames. This is the unit that shards over the LED mesh
    axis (SURVEY.md N1).
    """
    np_sz = opts.np_size
    m = mask[:, None, None]

    patches = jax.vmap(lambda s: crop_patch(obj_f, s, np_sz))(starts)
    objf_crop = fftshift2d(patches)
    objf_crop_p = objf_crop * pupil
    obj_crop_p = ifft2(objf_crop_p)
    objf_up = fft2(_amp_replace(obj_crop_p, amps, opts.eps))
    diff = objf_up - objf_crop_p

    d_obj = _object_delta(diff, pupil, opts.delta2) * m
    d_obj = fftshift2d(d_obj)

    def paste(acc, inp):
        d, s = inp
        return paste_patch_add(acc, d, s), None

    d_obj_full, _ = jax.lax.scan(paste, jnp.zeros_like(obj_f), (d_obj, starts))
    obj_f = obj_f + d_obj_full

    omax = jnp.max(jnp.abs(obj_f))
    d_pupil = _pupil_delta(diff, objf_crop, omax, support, opts.delta1) * m
    pupil = pupil + opts.pupil_step_scale * jnp.sum(d_pupil, axis=0)

    if opts.collect_metrics:
        resid = jnp.sum(((amps - jnp.abs(obj_crop_p)) * m) ** 2)
        upd = jnp.sum(jnp.abs(d_obj) ** 2)
    else:  # match led_step/Pallas: metrics off ⇒ skip the full reductions
        resid = upd = jnp.zeros((), amps.dtype)
    return obj_f, pupil, jnp.stack([resid, upd])


def sweep_batched(obj_f, pupil, amps, starts, *, support, opts: EPRYOptions,
                  mask=None):
    """One chunked Gauss–Seidel-over-Jacobi sweep (see module docstring).

    ``amps``/``starts``/``mask`` are either flat (K, ...) arrays — chunked
    here per ``opts`` — or pre-chunked (n_chunks, C, ...) arrays (the
    caller hoisted the static permutation out of the iteration loop).
    """
    if amps.ndim == 3:  # flat: apply the static chunk permutation in-line
        k = amps.shape[0]
        csize = effective_chunk_size(opts.np_size, opts.chunk_size, k,
                                     opts.use_pallas, "batched")
        perm, mask_np, n_chunks = chunk_schedule(k, csize, opts.chunk_assign)
        pad = perm.size - k
        if pad:
            amps = jnp.concatenate([amps, jnp.zeros((pad,) + amps.shape[1:], amps.dtype)])
            starts = jnp.concatenate([starts, jnp.zeros((pad, 2), starts.dtype)])
        c = perm.size // n_chunks
        amps = amps[perm].reshape(n_chunks, c, *amps.shape[1:])
        starts = starts[perm].reshape(n_chunks, c, 2)
        mask = jnp.asarray(mask_np, jnp.abs(obj_f).dtype).reshape(n_chunks, c)
    elif mask is None:
        mask = jnp.ones(amps.shape[:2], jnp.abs(obj_f).dtype)

    def body(carry, inp):
        obj_f, pupil = carry
        a, s, m2 = inp
        obj_f, pupil, met = jacobi_chunk(obj_f, pupil, a, s, m2,
                                         support=support, opts=opts)
        return (obj_f, pupil), met

    (obj_f, pupil), mets = jax.lax.scan(body, (obj_f, pupil), (amps, starts, mask))
    return obj_f, pupil, mets.sum(axis=0)


# --------------------------------------------------------------------- top level


def _planes(z: jax.Array) -> jax.Array:
    """Complex → stacked (2, ...) real planes, for host transfer."""
    return jnp.stack([jnp.real(z), jnp.imag(z)])


def _unplanes_np(p: np.ndarray) -> np.ndarray:
    return np.asarray(p[0]) + 1j * np.asarray(p[1])


def _run_body(amps, starts, support_r, obj_init, pupil_init, opts: EPRYOptions, use_init: bool):
    """The whole reconstruction as one traceable computation.

    Every argument and result is a real array: complex fields exist only
    inside the compiled computation (the reference's CV_64FC2 2-plane layout
    at the boundary, native complex inside). ``obj_init``/``pupil_init`` are
    (2, ...) real/imag planes used when ``use_init`` (checkpoint resume).
    Jitted as :func:`_run_jit` (one problem) and batched over independent
    same-geometry problems by :func:`_run_jit_channels` (RGB channels).
    """
    dtype = opts.cdtype
    support = support_r.astype(dtype)
    if use_init:
        obj_f = (obj_init[0] + 1j * obj_init[1]).astype(dtype)
        pupil = (pupil_init[0] + 1j * pupil_init[1]).astype(dtype)
    else:
        obj_f, pupil = init_traced(amps, support_r, opts)

    sweep_once = _make_sweep_fn(amps, starts, support, support_r, opts)

    def body(carry, _):
        obj_f, pupil = carry
        obj_f, pupil, m = sweep_once(obj_f, pupil)
        return (obj_f, pupil), m

    (obj_f, pupil), metrics = jax.lax.scan(
        body, (obj_f, pupil), None, length=opts.iterations
    )
    # Per-iteration inverse transform of the full spectrum (fpmMain.cpp:481);
    # only the final one is observable, so compute it once.
    obj_crop = ifft2(ifftshift2d(obj_f))
    return _planes(obj_f), _planes(pupil), _planes(obj_crop), metrics


_run_jit = functools.partial(jax.jit, static_argnames=("opts", "use_init"))(_run_body)


@functools.partial(jax.jit, static_argnames=("opts", "use_init"))
def _run_jit_channels(amps_b, starts, support_r, obj_init_b, pupil_init_b,
                      opts: EPRYOptions, use_init: bool):
    """N independent same-geometry problems as ONE compiled program.

    The RGB color channels (fpmMain.cpp:109-115) are identical-shape
    independent reconstructions sharing one schedule/geometry, so they batch
    over a leading axis instead of serializing three dispatches. The XLA
    path uses ``vmap`` — the per-channel DFT matmuls become batched
    ``dot_general``s, feeding the MXU three problems' worth of rows at once
    (small-Np solves underfeed it alone). The fused Pallas kernels keep
    their single-problem grid semantics, so under ``use_pallas`` channels
    run via ``lax.map`` (sequential inside one program — still one dispatch
    and one compile, just no cross-channel batching).
    """

    def one(amps, obj_init, pupil_init):
        return _run_body(amps, starts, support_r, obj_init, pupil_init,
                         opts, use_init)

    if opts.use_pallas:
        return jax.lax.map(lambda t: one(*t),
                           (amps_b, obj_init_b, pupil_init_b))
    return jax.vmap(one)(amps_b, obj_init_b, pupil_init_b)


def _make_sweep_fn(amps, starts, support, support_r, opts: EPRYOptions):
    """Mode dispatch + the batched mode's hoisted static chunk permutation.

    Returns ``sweep_once(obj_f, pupil) -> (obj_f, pupil, metrics)`` closed
    over the (possibly pre-chunked) schedule arrays, shared by the
    static-iteration program (:func:`_run_jit`) and the dynamic-count
    benchmark program (:func:`_run_sweeps_dynamic_jit`).
    """
    if opts.mode == "batched":
        k = amps.shape[0]
        # Clamp to the fused kernel's compile ceiling here (not only in
        # reconstruct): bench.py calls _run_jit directly with raw options.
        csize = effective_chunk_size(opts.np_size, opts.chunk_size, k,
                                     opts.use_pallas, "batched")
        perm, mask_np, n_chunks = chunk_schedule(k, csize, opts.chunk_assign)
        pad = perm.size - k
        a, s = amps, starts
        if pad:
            a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
            s = jnp.concatenate([s, jnp.zeros((pad, 2), s.dtype)])
        c = perm.size // n_chunks
        amps_it = a[perm].reshape(n_chunks, c, *a.shape[1:])
        starts_it = s[perm].reshape(n_chunks, c, 2)
        mask = jnp.asarray(mask_np, support_r.dtype).reshape(n_chunks, c)
        sweep = sweep_batched_pallas if opts.use_pallas else sweep_batched

        def sweep_once(obj_f, pupil):
            return sweep(obj_f, pupil, amps_it, starts_it,
                         support=support, opts=opts, mask=mask)

        return sweep_once

    sweep = sweep_pallas if opts.use_pallas else sweep_sequential

    def sweep_once(obj_f, pupil):
        return sweep(obj_f, pupil, amps, starts, support=support, opts=opts)

    return sweep_once


# NOTE: a dynamic-trip-count benchmark variant (fori_loop over sweeps) was
# measured and rejected: the while loop adds ~58 µs per sweep on this chip
# (+52% on the chunked kernel's 111 µs sweeps) and its remote compile takes
# ~4× longer than two static-length programs. bench.py uses _run_jit with a
# static two-point iteration ladder instead.


@functools.partial(jax.jit, static_argnames=("opts", "led_index"))
def _led_intermediates_jit(obj_planes, pupil_planes, amps, starts, support_r,
                           opts: EPRYOptions, led_index: int):
    """Intermediate per-LED quantities for debug introspection (C12 parity).

    The reference's debug mode opens windows of the working spectra at six
    points inside each LED update (fpmMain.cpp:366-375, 396-402, 421-425,
    435-441, 449-455). This replays the sequential sweep up to schedule
    position ``led_index`` and returns that LED's intermediates, each as
    (2, Np, Np) real/imag planes:

      objf_crop   — sub-spectrum crop (fpmMain.cpp:358-362, shown :366-375)
      objf_crop_p — crop × pupil (fpmMain.cpp:364)
      obj_crop_p  — image-plane field (fpmMain.cpp:365, shown :396-402)
      objf_up     — amplitude-replaced spectrum (fpmMain.cpp:389-394)
      d_obj       — object-spectrum increment (fpmMain.cpp:404-419, :421-425)
      pupil       — pupil after this LED's EPRY update (:449-455)
    """
    dtype = opts.cdtype
    support = support_r.astype(dtype)
    obj_f = (obj_planes[0] + 1j * obj_planes[1]).astype(dtype)
    pupil = (pupil_planes[0] + 1j * pupil_planes[1]).astype(dtype)

    omax0 = jnp.max(jnp.abs(obj_f))
    if led_index > 0:
        step = functools.partial(led_step, support=support, opts=opts)
        (obj_f, pupil, _), _ = jax.lax.scan(
            step, (obj_f, pupil, omax0), (amps[:led_index], starts[:led_index])
        )

    amp, start = amps[led_index], starts[led_index]
    patch_c = crop_patch(obj_f, start, opts.np_size)
    objf_crop = fftshift2d(patch_c)
    objf_crop_p = objf_crop * pupil
    obj_crop_p = ifft2(objf_crop_p)
    objf_up = fft2(_amp_replace(obj_crop_p, amp, opts.eps))
    diff = objf_up - objf_crop_p
    d_obj = _object_delta(diff, pupil, opts.delta2)

    obj_f2 = paste_patch_add(obj_f, fftshift2d(d_obj), start)
    omax = jnp.max(jnp.abs(obj_f2)) if opts.global_max == "exact" else omax0
    d_pupil = _pupil_delta(diff, objf_crop, omax, support, opts.delta1)

    return {
        "objf_crop": _planes(objf_crop),
        "objf_crop_p": _planes(objf_crop_p),
        "obj_crop_p": _planes(obj_crop_p),
        "objf_up": _planes(objf_up),
        "d_obj": _planes(d_obj),
        "pupil": _planes(pupil + d_pupil),
    }


def led_intermediates(state, images, geom, cfg, led_index: int,
                      dtype="complex64") -> dict[str, np.ndarray]:
    """Host-level C12 debug dump: complex intermediates of one LED update.

    ``state`` is (obj_f_centered, pupil) at sweep start (e.g. from a
    ReconResult or checkpoint); ``led_index`` is the schedule position
    (0 = lowest NA).
    """
    opts = EPRYOptions.from_config(cfg, dtype=jnp.dtype(dtype).name,
                                   collect_metrics=False)
    amps, starts = _sorted_device_inputs(images, geom, opts.cdtype)
    if not 0 <= led_index < amps.shape[0]:
        raise ValueError(f"led_index {led_index} outside schedule [0, {amps.shape[0]})")
    support_r = jnp.asarray(pupil_support(cfg, centered=False), dtype=opts.rdtype)
    o0, p0 = np.asarray(state[0]), np.asarray(state[1])
    obj_planes = jnp.asarray(np.stack([o0.real, o0.imag]), opts.rdtype)
    pupil_planes = jnp.asarray(np.stack([p0.real, p0.imag]), opts.rdtype)
    out = _led_intermediates_jit(obj_planes, pupil_planes, amps, starts,
                                 support_r, opts, int(led_index))
    return {k: _unplanes_np(np.asarray(v)) for k, v in out.items()}


def _sorted_device_inputs(images, geom: LEDGeometry, dtype):
    """Sort amplitudes + crop starts into schedule order, ship to device."""
    real_dtype = jnp.dtype("float64" if jnp.dtype(dtype) == jnp.complex128 else "float32")
    amps = np.sqrt(np.asarray(images, dtype=np.float64))[geom.schedule]
    starts = geom.crop_start[geom.schedule]
    return jnp.asarray(amps, dtype=real_dtype), jnp.asarray(starts, dtype=jnp.int32)


def reconstruct(
    images,
    geom: LEDGeometry,
    cfg: FPMConfig,
    iterations: int | None = None,
    dtype: Any | None = None,
    initial_state: tuple | None = None,
    **opt_overrides,
) -> ReconResult:
    """End-to-end reconstruction: the jitted ``runFPM`` equivalent.

    Args:
      images: (K, Np, Np) background-subtracted intensity stack ordered by
        ``geom.led_numbers``.
      geom: LED geometry table.
      cfg: experiment configuration.
      iterations: overrides ``cfg.iterations`` (the reference's argv[2]).
      dtype: solver complex dtype (default from ``cfg.dtype``).
      initial_state: optional ``(obj_f_centered, pupil)`` arrays to resume
        from a checkpoint instead of the fresh init contract.
    """
    dtype = jnp.dtype(dtype or cfg.dtype)
    opts = EPRYOptions.from_config(
        cfg, iterations=iterations if iterations is not None else cfg.iterations,
        dtype=dtype.name, **opt_overrides,
    )
    k = len(geom.schedule)
    requested = opts.chunk_size if opts.chunk_size > 0 else k
    eff_chunk = effective_chunk_size(
        opts.np_size, opts.chunk_size, k, opts.use_pallas, opts.mode
    )
    eff_chunk = eff_chunk if eff_chunk > 0 else k
    if eff_chunk < requested:
        print(f"[fpm-tpu] pallas chunked kernel: chunk_size {requested} "
              f"exceeds the compile ceiling at Np={opts.np_size}; "
              f"clamped to {eff_chunk}")
        opts = dataclasses.replace(opts, chunk_size=eff_chunk)
    amps, starts = _sorted_device_inputs(images, geom, dtype)
    support_r = jnp.asarray(pupil_support(cfg, centered=False), dtype=opts.rdtype)

    if initial_state is not None:
        o0 = np.asarray(initial_state[0])
        p0 = np.asarray(initial_state[1])
        obj_init = jnp.asarray(np.stack([o0.real, o0.imag]), dtype=opts.rdtype)
        pupil_init = jnp.asarray(np.stack([p0.real, p0.imag]), dtype=opts.rdtype)
        use_init = True
    else:
        n = cfg.n_large
        obj_init = jnp.zeros((2, n, n), dtype=opts.rdtype)
        pupil_init = jnp.zeros((2, cfg.np_size, cfg.np_size), dtype=opts.rdtype)
        use_init = False

    obj_p, pupil_p, obj_crop_p, metrics = _run_jit(
        amps, starts, support_r, obj_init, pupil_init, opts, use_init
    )
    metrics = np.asarray(metrics)
    return ReconResult(
        obj_crop=_unplanes_np(obj_crop_p),
        obj_f_centered=_unplanes_np(obj_p),
        pupil=_unplanes_np(pupil_p),
        metrics={
            "data_residual": metrics[:, 0],
            "update_norm": metrics[:, 1],
        },
    )


def reconstruct_channels(
    channel_images,
    geom: LEDGeometry,
    cfg: FPMConfig,
    iterations: int | None = None,
    dtype: Any | None = None,
    initial_state: tuple | None = None,
    **opt_overrides,
) -> list[ReconResult]:
    """Reconstruct N independent same-geometry channels in one program.

    The ``--color-mode rgb`` solve path: channels share the LED schedule,
    crop geometry, and pupil support, so they batch over a leading axis
    (see :func:`_run_jit_channels`) instead of running three sequential
    dispatches of the same compiled program.

    Args:
      channel_images: sequence of N (K, Np, Np) intensity stacks, each
        ordered by ``geom.led_numbers`` (R, G, B for the RGB path).
      initial_state: optional ``(obj_f_centered, pupil)`` with a leading
        N axis — stacked checkpoint state for resume.

    Returns one :class:`ReconResult` per channel, in input order.
    """
    dtype = jnp.dtype(dtype or cfg.dtype)
    opts = EPRYOptions.from_config(
        cfg, iterations=iterations if iterations is not None else cfg.iterations,
        dtype=dtype.name, **opt_overrides,
    )
    k = len(geom.schedule)
    eff_chunk = effective_chunk_size(
        opts.np_size, opts.chunk_size, k, opts.use_pallas, opts.mode
    )
    if eff_chunk != opts.chunk_size:
        opts = dataclasses.replace(opts, chunk_size=eff_chunk)
    amps_b = jnp.stack(
        [_sorted_device_inputs(im, geom, dtype)[0] for im in channel_images]
    )
    starts = jnp.asarray(geom.crop_start[geom.schedule], dtype=jnp.int32)
    support_r = jnp.asarray(pupil_support(cfg, centered=False), dtype=opts.rdtype)

    n_ch = len(channel_images)
    if initial_state is not None:
        o0 = np.asarray(initial_state[0])
        p0 = np.asarray(initial_state[1])
        obj_init = jnp.asarray(
            np.stack([o0.real, o0.imag], axis=1), dtype=opts.rdtype)
        pupil_init = jnp.asarray(
            np.stack([p0.real, p0.imag], axis=1), dtype=opts.rdtype)
        use_init = True
    else:
        n = cfg.n_large
        obj_init = jnp.zeros((n_ch, 2, n, n), dtype=opts.rdtype)
        pupil_init = jnp.zeros((n_ch, 2, cfg.np_size, cfg.np_size), dtype=opts.rdtype)
        use_init = False

    obj_p, pupil_p, obj_crop_p, metrics = _run_jit_channels(
        amps_b, starts, support_r, obj_init, pupil_init, opts, use_init
    )
    metrics = np.asarray(metrics)
    return [
        ReconResult(
            obj_crop=_unplanes_np(np.asarray(obj_crop_p)[i]),
            obj_f_centered=_unplanes_np(np.asarray(obj_p)[i]),
            pupil=_unplanes_np(np.asarray(pupil_p)[i]),
            metrics={
                "data_residual": metrics[i, :, 0],
                "update_norm": metrics[i, :, 1],
            },
        )
        for i in range(n_ch)
    ]
