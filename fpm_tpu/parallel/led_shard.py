"""LED-batch data parallelism (SURVEY.md N1).

The reference's per-LED loop is strictly sequential because every LED update
mutates the shared spectrum and pupil (fpmMain.cpp:348-476). The scalable
TPU formulation is the *chunked* Gauss–Seidel-over-Jacobi sweep
(models.epry.sweep_batched): the NA-sorted schedule is split into chunks
processed sequentially; within a chunk every LED's increment is computed
from the chunk-start state, so the within-chunk LED axis is embarrassingly
parallel — shard it over the ``led`` mesh axis with ``shard_map``,
accumulate local object-spectrum increments into a full-size buffer, and
reconcile with one ``psum`` per chunk for the object and one for the pupil
consensus (the all-reduce rides ICI within a slice, DCN across hosts —
SURVEY.md N3). Whole-sweep Jacobi (``chunk_size=0``, one psum pair per
sweep) is measurably unstable at the reference's LED counts — see
models/epry.py's module docstring and benchmarks/convergence.py.

Chunk sizes rarely divide the mesh; chunks are padded with masked dummy
frames (mask zeroes their increments and metrics), keeping shapes static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import FPMConfig
from ..geometry import LEDGeometry
from ..models.epry import (
    EPRYOptions,
    ReconResult,
    _amp_replace,
    _object_delta,
    _pupil_delta,
    _sorted_device_inputs,
    chunk_schedule,
    init_state,
)
from ..ops import crop_patch, fft2, fftshift2d, ifft2, ifftshift2d, paste_patch_add
from .mesh import make_mesh


def _chunk_increments(obj_f, pupil, support, amps, starts, mask, *, opts: EPRYOptions):
    """This device's LOCAL increments for one chunk from the given state.

    Returns ``(d, v, mets)``: the object-spectrum increment, the pupil EPRY
    numerator sum WITHOUT the 1/max|O| factor (a scalar divide that
    commutes with psum and needs the post-consensus spectrum), and local
    metric partials. The Pallas route returns f32 (2, N, N) planes
    (fused_chunk_increments); the XLA route returns complex arrays.
    Separated from consensus/apply so the stale-pipelined sweep can issue
    chunk c's psum while computing chunk c+1's increments.
    """
    if opts.use_pallas:
        import jax as _jax

        from ..ops.pallas_kernels import fused_chunk_increments

        o_planes = jnp.stack([jnp.real(obj_f), jnp.imag(obj_f)]).astype(jnp.float32)
        p_planes = jnp.stack([jnp.real(pupil), jnp.imag(pupil)]).astype(jnp.float32)
        support_r = jnp.real(support).astype(jnp.float32)
        return fused_chunk_increments(
            o_planes, p_planes, support_r,
            amps.astype(jnp.float32),
            starts.reshape(-1).astype(jnp.int32),
            (mask > 0).astype(jnp.int32),
            np_size=opts.np_size,
            n_rows=obj_f.shape[0], n_cols=obj_f.shape[1],
            delta1=opts.delta1, delta2=opts.delta2, eps=opts.eps,
            interpret=_jax.default_backend() != "tpu",
            dft_precision=opts.dft_precision,
            pupil_radius=opts.pupil_radius,
            collect_metrics=opts.collect_metrics,
            vma=("led",),
        )

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

    # Accumulator is device-varying over 'led' (each device pastes its own
    # LED block); mark it so under shard_map's varying-axis typing.
    acc0 = jax.lax.pcast(jnp.zeros_like(obj_f), ("led",), to="varying")
    d_obj_full, _ = jax.lax.scan(paste, acc0, (d_obj, starts))

    # omax=1.0: the true 1/max|O| factor is applied after the consensus.
    v = jnp.sum(_pupil_delta(diff, objf_crop, 1.0, support, opts.delta1) * m,
                axis=0)
    if opts.collect_metrics:
        resid = jnp.sum(((amps - jnp.abs(obj_crop_p)) * m) ** 2)
        upd = jnp.sum(jnp.abs(d_obj * m) ** 2)
    else:  # two full (C, Np, Np) reductions + psum bytes saved when off
        resid = upd = jnp.zeros((), amps.dtype)
    return d_obj_full, v, jnp.stack([resid, upd])


def _consensus_psum(d, v, mets, *, opts: EPRYOptions, axes="led"):
    """The per-chunk all-reduces over the LED axis.

    ``comm_precision='bf16'`` (Pallas f32-planes route only) casts the
    object-increment and pupil-numerator payloads to bf16 before the psum —
    halving every consensus payload on the wire (the weak-scaling lever,
    SCALING.md) — and accumulates back in f32.
    """
    if opts.comm_precision == "bf16":
        d = jax.lax.psum(d.astype(jnp.bfloat16), axes).astype(jnp.float32)
        v = jax.lax.psum(v.astype(jnp.bfloat16), axes).astype(jnp.float32)
    else:
        d = jax.lax.psum(d, axes)
        v = jax.lax.psum(v, axes)
    mets = jax.lax.psum(mets, axes)
    return d, v, mets


def _apply_consensus(obj_f, pupil, d, v, *, opts: EPRYOptions):
    """Apply psum'd increments: object add → global max|O| → pupil add."""
    if not jnp.iscomplexobj(d):  # Pallas planes route
        d = (d[0] + 1j * d[1]).astype(obj_f.dtype)
        v = (v[0] + 1j * v[1]).astype(pupil.dtype)
    obj_f = obj_f + d
    # Global max|O| of the *updated* spectrum — replicated here, but under
    # tile sharding this is the lax.pmax the reference's cv::minMaxLoc
    # becomes (fpmMain.cpp:467).
    omax = jnp.max(jnp.abs(obj_f))
    pupil = pupil + opts.pupil_step_scale * v / omax
    return obj_f, pupil


def _sharded_chunk(obj_f, pupil, support, amps, starts, mask, *, opts: EPRYOptions):
    """Per-device body of one Jacobi chunk (runs under shard_map).

    ``amps``/``starts``/``mask`` hold this device's slice of the chunk;
    ``obj_f``, ``pupil``, ``support`` are replicated.
    """
    d, v, mets = _chunk_increments(obj_f, pupil, support, amps, starts, mask,
                                   opts=opts)
    rdt = jnp.abs(obj_f).dtype
    d, v, mets = _consensus_psum(d, v, mets.astype(rdt), opts=opts)
    obj_f, pupil = _apply_consensus(obj_f, pupil, d, v, opts=opts)
    return obj_f, pupil, mets


def _sharded_sweep(obj_f, pupil, support, amps, starts, mask, *, opts: EPRYOptions):
    """One full sweep: sequential scan over chunks, each chunk sharded.

    ``amps`` (n_chunks, C_local, Np, Np), ``starts`` (n_chunks, C_local, 2),
    ``mask`` (n_chunks, C_local) are this device's slices.

    ``opts.stale_consensus`` software-pipelines the consensus: chunk c+1's
    increments are computed from the state BEFORE chunk c's psum is applied
    (one chunk of Gauss–Seidel freshness sacrificed — convergence pinned in
    tests/test_batched_convergence.py), which removes the data dependence
    between each chunk's all-reduce and the next chunk's DFT compute so
    XLA's async collectives overlap them (the weak-scaling lever,
    SCALING.md).
    """
    rdt = jnp.abs(obj_f).dtype

    if not opts.stale_consensus:
        def body(carry, inp):
            obj_f, pupil = carry
            a, s, m2 = inp
            obj_f, pupil, met = _sharded_chunk(obj_f, pupil, support, a, s, m2,
                                               opts=opts)
            return (obj_f, pupil), met

        (obj_f, pupil), mets = jax.lax.scan(body, (obj_f, pupil),
                                            (amps, starts, mask))
        return obj_f, pupil, mets.sum(axis=0)

    # --- stale-pipelined: prologue computes chunk 0's increments; each scan
    # step computes chunk c+1's increments (from the state still missing
    # chunk c) while chunk c's psum+apply proceeds; epilogue applies the
    # last pending chunk.
    inc0 = _chunk_increments(obj_f, pupil, support, amps[0], starts[0],
                             mask[0], opts=opts)

    def body(carry, inp):
        obj_f, pupil, (d_p, v_p, m_p) = carry
        a, s, m2 = inp
        # Independent of the pending psums → overlappable by XLA.
        d_n, v_n, m_n = _chunk_increments(obj_f, pupil, support, a, s, m2,
                                          opts=opts)
        d_p, v_p, m_p = _consensus_psum(d_p, v_p, m_p.astype(rdt), opts=opts)
        obj_f, pupil = _apply_consensus(obj_f, pupil, d_p, v_p, opts=opts)
        return (obj_f, pupil, (d_n, v_n, m_n)), m_p

    (obj_f, pupil, (d_l, v_l, m_l)), mets = jax.lax.scan(
        body, (obj_f, pupil, inc0),
        (amps[1:], starts[1:], mask[1:]),
    )
    d_l, v_l, m_l = _consensus_psum(d_l, v_l, m_l.astype(rdt), opts=opts)
    obj_f, pupil = _apply_consensus(obj_f, pupil, d_l, v_l, opts=opts)
    return obj_f, pupil, mets.sum(axis=0) + m_l


@functools.partial(
    jax.jit,
    static_argnames=("opts", "mesh"),
    donate_argnames=("obj_f", "pupil"),
)
def _run_led_sharded(obj_f, pupil, support, amps, starts, mask, opts: EPRYOptions, mesh: Mesh):
    # check_vma must be off for the Pallas route: jax's pallas HLO
    # interpreter (the CPU test path) internally mixes varying and
    # replicated operands in a dynamic_slice, which the vma checker
    # rejects (jax suggests check_vma=False as the workaround). The XLA
    # body keeps full vma checking.
    sweep = jax.shard_map(
        functools.partial(_sharded_sweep, opts=opts),
        mesh=mesh,
        in_specs=(P(), P(), P(), P(None, "led"), P(None, "led"), P(None, "led")),
        out_specs=(P(), P(), P()),
        check_vma=not opts.use_pallas,
    )

    def body(carry, _):
        obj_f, pupil = carry
        obj_f, pupil, metrics = sweep(obj_f, pupil, support, amps, starts, mask)
        return (obj_f, pupil), metrics

    (obj_f, pupil), metrics = jax.lax.scan(body, (obj_f, pupil), None, length=opts.iterations)
    obj_crop = ifft2(ifftshift2d(obj_f))
    return obj_f, pupil, obj_crop, metrics


def prepare_led_sharded(
    images,
    geom: LEDGeometry,
    cfg: FPMConfig,
    mesh: Mesh,
    iterations: int | None = None,
    dtype=None,
    initial_state: tuple | None = None,
    **opt_overrides,
):
    """Device-placed inputs + opts for :func:`_run_led_sharded`.

    Chunks the schedule (models.epry.chunk_schedule), pads each chunk to a
    multiple of the led-axis device count so shard_map splits evenly, and
    places every array with its mesh sharding. Split out of
    :func:`reconstruct_led_sharded` so benchmarks/scaling.py can lower and
    compile the identical program for HLO collective inventory.
    """
    dtype = jnp.dtype(dtype or cfg.dtype)
    n_led = mesh.shape["led"]
    opts = EPRYOptions.from_config(
        cfg,
        iterations=iterations if iterations is not None else cfg.iterations,
        mode="batched",
        **opt_overrides,
    )

    amps, starts = _sorted_device_inputs(images, geom, dtype)
    k = amps.shape[0]
    # Single source of truth for what chunk actually runs (Pallas compile
    # ceiling over n_led devices + round-up to a multiple of n_led) — the
    # same function the CLI fingerprint calls, so provenance ≡ execution.
    import dataclasses as _dc

    from ..models.epry import effective_chunk_size

    requested = opts.chunk_size if opts.chunk_size > 0 else k
    c_eff = effective_chunk_size(cfg.np_size, opts.chunk_size, k,
                                 opts.use_pallas, "batched", n_led=n_led)
    if opts.use_pallas and c_eff < requested:
        print(f"[fpm-tpu] pallas chunked kernel: chunk_size {requested} "
              f"exceeds the compile ceiling at Np={cfg.np_size} over "
              f"{n_led} devices; clamped to {c_eff}")
    opts = _dc.replace(opts, chunk_size=c_eff)
    if initial_state is not None:  # checkpoint resume: skip the seed init
        from ..geometry import pupil_support as _pupil_support

        rdt = jnp.zeros((), dtype).real.dtype
        support = jnp.asarray(_pupil_support(cfg, centered=False),
                              rdt).astype(dtype)
        obj_f = jnp.asarray(initial_state[0], dtype=dtype)
        pupil = jnp.asarray(initial_state[1], dtype=dtype)
    else:
        obj_f, pupil, support = init_state(cfg, geom, amps, dtype=dtype)

    # chunk_size=0 means one whole-sweep chunk; derive the per-chunk width
    # from the schedule itself (perm.size // n_chunks, the same contract as
    # models.epry sweep_batched) rather than re-deriving it from c_eff.
    perm, mask_np, n_chunks = chunk_schedule(k, c_eff, opts.chunk_assign)
    c_w = perm.size // n_chunks
    pad = perm.size - k
    if pad:
        amps = jnp.concatenate([amps, jnp.zeros((pad,) + amps.shape[1:], amps.dtype)])
        starts = jnp.concatenate([starts, jnp.zeros((pad, 2), starts.dtype)])
    amps = amps[perm].reshape(n_chunks, c_w, *amps.shape[1:])
    starts = starts[perm].reshape(n_chunks, c_w, 2)
    mask = jnp.asarray(mask_np, amps.dtype).reshape(n_chunks, c_w)

    rep = NamedSharding(mesh, P())
    led_sh = NamedSharding(mesh, P(None, "led"))
    obj_f, pupil, support = jax.device_put((obj_f, pupil, support), rep)
    amps, starts, mask = (
        jax.device_put(amps, led_sh),
        jax.device_put(starts, led_sh),
        jax.device_put(mask, led_sh),
    )
    return (obj_f, pupil, support, amps, starts, mask), opts


def reconstruct_led_sharded(
    images,
    geom: LEDGeometry,
    cfg: FPMConfig,
    mesh: Mesh | None = None,
    iterations: int | None = None,
    dtype=None,
    initial_state: tuple | None = None,
    **opt_overrides,
) -> ReconResult:
    """Multi-device epoch-synchronous reconstruction, LED axis sharded.

    ``initial_state`` is an optional (obj_f_centered, pupil) pair for
    checkpoint resume.
    """
    if mesh is None:
        mesh = make_mesh(tile=1)
    args, opts = prepare_led_sharded(
        images, geom, cfg, mesh, iterations=iterations, dtype=dtype,
        initial_state=initial_state, **opt_overrides,
    )
    obj_f, pupil, obj_crop, metrics = _run_led_sharded(*args, opts, mesh)
    metrics = np.asarray(metrics)
    return ReconResult(
        obj_crop=np.asarray(obj_crop),
        obj_f_centered=np.asarray(obj_f),
        pupil=np.asarray(pupil),
        metrics={"data_residual": metrics[:, 0], "update_norm": metrics[:, 1]},
    )
