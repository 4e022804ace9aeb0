"""Spectrum-tile spatial parallelism with halo exchange (SURVEY.md N2).

The reference holds one monolithic ``Nlarge×Mlarge`` spectrum in RAM
(fpmMain.cpp:330-332). For large-FOV reconstructions the spectrum is the
memory bottleneck, so here it is row-sharded over the ``tile`` mesh axis with
``shard_map``; each sweep:

1. **Halo exchange** — every tile ``ppermute``-receives the ``Np`` rows
   following its block, forming an extended ``(S+Np, Nlarge)`` block so any
   LED sub-aperture whose rows straddle tile boundaries can be cropped
   locally. One hop when the tile height ``S`` ≥ ``Np``; ``ceil(Np/S)``
   hops when the spectrum is split finer than a patch (round 5 — lifts the
   old ``S ≥ Np`` limit; total halo bytes are hop-count-independent).
2. **Owner-computes** — LEDs are partitioned host-side by the tile that owns
   their patch's first row (the geometry is static data, fpmMain.cpp:156-168),
   and further split across the ``led`` axis; per-device worksets are padded
   + masked to keep shapes static.
3. **Reverse halo** — each device's accumulated increments that landed in its
   halo rows are ``ppermute``d back to the owner tile and added.
4. **Collectives** — ``lax.psum`` over ``led`` reconciles object increments,
   ``lax.pmax`` over ``tile`` realizes the reference's global ``max|O|``
   reduction (``cv::minMaxLoc`` over the full spectrum, fpmMain.cpp:467),
   and ``psum`` over both axes forms the pupil consensus.

Chunked Gauss–Seidel-over-Jacobi sweep semantics, identical to
``models.epry.sweep_batched`` up to floating-point reduction order: the
NA-sorted schedule is split into ``ceil(K/chunk_size)`` strided chunks
processed sequentially (the measured stability condition at realistic LED
counts — models/epry.py docstring, benchmarks/convergence.py); each chunk
does one halo exchange + one consensus round. ``chunk_size=0`` degenerates
to whole-sweep Jacobi (one collective round per sweep, unstable at K≳100).
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
    init_state,
)
from ..ops import fft2, fftshift2d, ifft2, ifftshift2d


def partition_leds_by_tile(
    geom: LEDGeometry,
    n_large: int,
    n_tile: int,
    n_led: int,
    np_size: int,
    chunk_size: int = 0,
    chunk_assign: str = "strided",
):
    """Host-side static partition of the LED schedule into per-device worksets.

    Chunk membership follows ``models.epry.chunk_schedule`` semantics
    (``n_chunks = ceil(K/chunk_size)``; ``chunk_size=0`` = one whole-sweep
    chunk) so the chunked tile-sharded sweep matches the single-device
    chunked sweep: ``'strided'`` puts schedule position i into chunk
    ``i % n_chunks`` (each chunk spans the NA range — the measured
    stability condition, models/epry.py docstring); ``'contiguous'`` keeps
    NA-sorted runs together. Within a chunk, LEDs go to the tile owning
    their patch's first row, round-robined over the ``led`` slots.

    Returns (idx, s): schedule positions shaped
    (n_chunks, n_led, n_tile, k_max), padded with -1, and the tile height.
    """
    s = n_large // n_tile
    if s * n_tile != n_large:
        raise ValueError(f"tile count {n_tile} must divide Nlarge={n_large}")
    if n_tile > 1 and np_size > n_large - s:
        # The Np-row halo must come entirely from OTHER tiles; past this
        # point a tile would wrap around to its own rows. (n_tile=1 is the
        # degenerate no-sharding case: the halo is never read.)
        raise ValueError(
            f"patch size {np_size} > Nlarge - tile height = {n_large - s}: "
            f"the halo would wrap around the {n_tile}-tile ring"
        )
    order = geom.schedule  # positions into geometry arrays
    k = len(order)
    c = chunk_size if chunk_size > 0 else k
    n_chunks = -(-k // c)
    owners = geom.crop_start[order, 0] // s
    if chunk_assign == "strided" and n_chunks > 1:
        chunk_of = np.arange(k) % n_chunks
    else:
        chunk_of = np.arange(k) // c
    worksets = [
        [[[] for _ in range(n_tile)] for _ in range(n_led)]
        for _ in range(n_chunks)
    ]
    counters = np.zeros((n_chunks, n_tile), dtype=np.int64)
    for pos_i, owner in enumerate(owners):
        ci = chunk_of[pos_i]
        led_slot = counters[ci, owner] % n_led
        worksets[ci][led_slot][owner].append(pos_i)
        counters[ci, owner] += 1
    k_max = max(
        1, max(len(w) for ch in worksets for row in ch for w in row)
    )
    idx = -np.ones((n_chunks, n_led, n_tile, k_max), dtype=np.int64)
    for ci in range(n_chunks):
        for li in range(n_led):
            for ti in range(n_tile):
                w = worksets[ci][li][ti]
                idx[ci, li, ti, : len(w)] = w
    return idx, s


def _tile_chunk_increments(obj_f_local, pupil, support, amps, starts_rel,
                           mask, *, opts, s, n_tile):
    """This device's LOCAL increments for one tile-sharded chunk.

    Forward halo (from the given state) + per-LED diffs on the extended
    block. Returns ``(d_ext, v, mets)``: the halo-extended object increment
    (f32 planes on the Pallas route, complex on the XLA route), the pupil
    EPRY numerator WITHOUT the 1/max|O| factor, and local metric partials.
    Separated from :func:`_tile_consensus_apply` so the stale-pipelined
    sweep can overlap chunk c's collectives with chunk c+1's compute.
    """
    np_sz = opts.np_size

    # --- forward halo: receive the Np rows following this tile's block.
    # With tile height s >= Np that is one hop (the next tile's first Np
    # rows); with s < Np the halo spans ceil(Np/s) following tiles — hop j
    # ppermutes tile i+j's block (full s rows, partial for the last hop).
    # Total wire bytes are hop-count-independent: Np rows in either case.
    parts = [obj_f_local]
    for j, lo in enumerate(range(0, np_sz, s), start=1):
        rows = min(s, np_sz - lo)
        fwd = [((i + j) % n_tile, i) for i in range(n_tile)]
        parts.append(jax.lax.ppermute(obj_f_local[:rows], "tile", perm=fwd))
    ext = jnp.concatenate(parts, axis=0)  # (S+Np, Nlarge)

    if opts.use_pallas:
        import jax as _jax

        from ..ops.pallas_kernels import fused_chunk_increments

        o_planes = jnp.stack([jnp.real(ext), jnp.imag(ext)]).astype(jnp.float32)
        p_planes = jnp.stack([jnp.real(pupil), jnp.imag(pupil)]).astype(jnp.float32)
        support_r = jnp.real(support).astype(jnp.float32)
        return fused_chunk_increments(
            o_planes, p_planes, support_r,
            amps.astype(jnp.float32),
            starts_rel.reshape(-1).astype(jnp.int32),
            (mask > 0).astype(jnp.int32),
            np_size=np_sz,
            n_rows=ext.shape[0], n_cols=ext.shape[1],
            delta1=opts.delta1, delta2=opts.delta2, eps=opts.eps,
            interpret=_jax.default_backend() != "tpu",
            dft_precision=opts.dft_precision,
            pupil_radius=opts.pupil_radius,
            collect_metrics=opts.collect_metrics,
            vma=("led", "tile"),
        )

    patches = jax.vmap(
        lambda st: jax.lax.dynamic_slice(ext, (st[0], st[1]), (np_sz, np_sz))
    )(starts_rel)
    objf_crop = fftshift2d(patches)
    objf_crop_p = objf_crop * pupil
    obj_crop_p = ifft2(objf_crop_p)
    objf_up = fft2(_amp_replace(obj_crop_p, amps, opts.eps))
    diff = objf_up - objf_crop_p

    m = mask[:, None, None]
    d_obj = fftshift2d(_object_delta(diff, pupil, opts.delta2) * m)

    def paste(acc, inp):
        d, st = inp
        cur = jax.lax.dynamic_slice(acc, (st[0], st[1]), (np_sz, np_sz))
        return jax.lax.dynamic_update_slice(acc, cur + d, (st[0], st[1])), None

    acc0 = jax.lax.pcast(jnp.zeros_like(ext), ("led",), to="varying")
    d_ext, _ = jax.lax.scan(paste, acc0, (d_obj, starts_rel))

    # omax=1.0: the true 1/max|O| factor is applied after the consensus.
    v = jnp.sum(_pupil_delta(diff, objf_crop, 1.0, support, opts.delta1) * m,
                axis=0)
    if opts.collect_metrics:
        resid = jnp.sum(((amps - jnp.abs(obj_crop_p)) * m) ** 2)
        upd = jnp.sum(jnp.abs(d_obj * m) ** 2)
    else:
        resid = upd = jnp.zeros((), amps.dtype)
    return d_ext, v, jnp.stack([resid, upd])


def _tile_consensus_apply(obj_f_local, pupil, d_ext, v, mets, *, opts, s,
                          n_tile):
    """Apply one chunk's consensus on the row-sharded spectrum.

    Object psum over 'led' → reverse halo (increments in halo rows belong
    to the next tile) → add → 'tile'-axis pmax realizing the reference's
    full-spectrum ``cv::minMaxLoc`` (fpmMain.cpp:467) → pupil consensus.
    ``comm_precision='bf16'`` (Pallas route) halves the psum and
    reverse-halo payloads on the wire; f32 accumulation.
    """
    np_sz = opts.np_size
    bf16_comm = opts.comm_precision == "bf16"
    planes = not jnp.iscomplexobj(d_ext)

    if bf16_comm:
        d_ext = jax.lax.psum(d_ext.astype(jnp.bfloat16), "led").astype(jnp.float32)
    else:
        d_ext = jax.lax.psum(d_ext, "led")
    if planes:
        d_ext = (d_ext[0] + 1j * d_ext[1]).astype(obj_f_local.dtype)

    # Reverse halo: increment rows beyond this tile's block belong to the
    # following tiles — hop j returns halo slab [(j-1)s, js) to tile i+j,
    # where it lands at that tile's first rows (mirror of the forward
    # halo's multi-hop structure; one hop when s >= Np).
    d_local = d_ext[:s]
    for j, lo in enumerate(range(0, np_sz, s), start=1):
        rows = min(s, np_sz - lo)
        slab = d_ext[s + lo : s + lo + rows]
        bwd = [(i, (i + j) % n_tile) for i in range(n_tile)]
        if bf16_comm:
            back = jax.lax.ppermute(
                jnp.stack([jnp.real(slab), jnp.imag(slab)]
                          ).astype(jnp.bfloat16),
                "tile", perm=bwd,
            ).astype(jnp.float32)
            halo_back = (back[0] + 1j * back[1]).astype(obj_f_local.dtype)
        else:
            halo_back = jax.lax.ppermute(slab, "tile", perm=bwd)
        d_local = d_local.at[:rows].add(halo_back)
    obj_f_local = obj_f_local + d_local

    omax = jax.lax.pmax(jnp.max(jnp.abs(obj_f_local)), "tile")

    if bf16_comm:
        v = jax.lax.psum(v.astype(jnp.bfloat16), ("led", "tile")).astype(jnp.float32)
    else:
        v = jax.lax.psum(v, ("led", "tile"))
    if planes:
        v = (v[0] + 1j * v[1]).astype(pupil.dtype)
    pupil = pupil + opts.pupil_step_scale * v / omax

    rdt = jnp.abs(obj_f_local).dtype
    mets = jax.lax.psum(mets.astype(rdt), ("led", "tile"))
    return obj_f_local, pupil, mets


def _tile_chunk(obj_f_local, pupil, support, amps, starts_rel, mask, *, opts, s, n_tile):
    """One Jacobi chunk on the row-sharded spectrum (under shard_map).

    ``amps``/``starts_rel``/``mask`` are this device's slice of the chunk's
    workset. Halo exchange, consensus, and the global-max pmax happen once
    per chunk — the chunked Gauss–Seidel-over-Jacobi semantics of
    ``models.epry.sweep_batched`` (the stability condition at realistic LED
    counts, models/epry.py docstring), now on the sharded spectrum.
    """
    d_ext, v, mets = _tile_chunk_increments(
        obj_f_local, pupil, support, amps, starts_rel, mask,
        opts=opts, s=s, n_tile=n_tile,
    )
    return _tile_consensus_apply(obj_f_local, pupil, d_ext, v, mets,
                                 opts=opts, s=s, n_tile=n_tile)


def _tile_sweep(obj_f_local, pupil, support, amps, starts_rel, mask, *, opts, s, n_tile):
    """Per-device sweep body: sequential scan over chunks (shard_map).

    Worksets arrive shaped (n_chunks, 1, 1, k_local, ...) from the
    (None, 'led', 'tile') sharding; drop the block dims and scan the chunk
    axis.

    ``opts.stale_consensus`` software-pipelines the chunk loop exactly as
    in parallel/led_shard.py: chunk c+1's forward halo + increments are
    computed from the state BEFORE chunk c's consensus lands (one chunk of
    Gauss–Seidel freshness sacrificed), so chunk c's psum / reverse halo /
    pmax overlap chunk c+1's DFT compute.
    """
    amps, starts_rel, mask = amps[:, 0, 0], starts_rel[:, 0, 0], mask[:, 0, 0]

    if not opts.stale_consensus:
        def body(carry, inp):
            obj_f_local, pupil = carry
            a, st, m2 = inp
            obj_f_local, pupil, met = _tile_chunk(
                obj_f_local, pupil, support, a, st, m2, opts=opts, s=s,
                n_tile=n_tile
            )
            return (obj_f_local, pupil), met

        (obj_f_local, pupil), mets = jax.lax.scan(
            body, (obj_f_local, pupil), (amps, starts_rel, mask)
        )
        return obj_f_local, pupil, mets.sum(axis=0)

    inc0 = _tile_chunk_increments(obj_f_local, pupil, support, amps[0],
                                  starts_rel[0], mask[0], opts=opts, s=s,
                                  n_tile=n_tile)

    def body(carry, inp):
        obj_f_local, pupil, pend = carry
        a, st, m2 = inp
        inc_next = _tile_chunk_increments(obj_f_local, pupil, support, a, st,
                                          m2, opts=opts, s=s, n_tile=n_tile)
        obj_f_local, pupil, met = _tile_consensus_apply(
            obj_f_local, pupil, *pend, opts=opts, s=s, n_tile=n_tile
        )
        return (obj_f_local, pupil, inc_next), met

    (obj_f_local, pupil, pend), mets = jax.lax.scan(
        body, (obj_f_local, pupil, inc0),
        (amps[1:], starts_rel[1:], mask[1:]),
    )
    obj_f_local, pupil, met_l = _tile_consensus_apply(
        obj_f_local, pupil, *pend, opts=opts, s=s, n_tile=n_tile
    )
    return obj_f_local, pupil, mets.sum(axis=0) + met_l


@functools.partial(
    jax.jit,
    static_argnames=("opts", "mesh", "s", "n_tile"),
    donate_argnames=("obj_f", "pupil"),
)
def _run_tile_sharded(obj_f, pupil, support, amps, starts_rel, mask, opts, mesh, s, n_tile):
    sweep = jax.shard_map(
        functools.partial(_tile_sweep, opts=opts, s=s, n_tile=n_tile),
        mesh=mesh,
        in_specs=(
            P("tile", None),               # obj_f row-sharded
            P(), P(),                      # pupil, support replicated
            P(None, "led", "tile"),        # per-device chunked LED worksets
            P(None, "led", "tile"),
            P(None, "led", "tile"),
        ),
        out_specs=(P("tile", None), P(), P()),
        check_vma=not opts.use_pallas,  # see parallel/led_shard.py
    )

    def body(carry, _):
        obj_f, pupil = carry
        o, p, metrics = sweep(obj_f, pupil, support, amps, starts_rel, mask)
        return (o, p), metrics

    (obj_f, pupil), metrics = jax.lax.scan(body, (obj_f, pupil), None, length=opts.iterations)
    obj_crop = ifft2(ifftshift2d(obj_f))
    return obj_f, pupil, obj_crop, metrics


def prepare_tile_sharded(
    images,
    geom: LEDGeometry,
    cfg: FPMConfig,
    mesh: Mesh,
    iterations: int | None = None,
    dtype=None,
    initial_state: tuple | None = None,
    **opt_overrides,
):
    """Device-placed inputs + (opts, s, n_tile) for :func:`_run_tile_sharded`.

    Split out of :func:`reconstruct_tile_sharded` so benchmarks/scaling.py
    can lower and compile the identical program for HLO collective
    inventory.
    """
    dtype = jnp.dtype(dtype or cfg.dtype)
    n_led, n_tile = mesh.shape["led"], mesh.shape["tile"]
    opts = EPRYOptions.from_config(
        cfg,
        iterations=iterations if iterations is not None else cfg.iterations,
        mode="batched",
        **opt_overrides,
    )
    if opts.use_pallas:
        # Pre-clamp to the fused kernel's compile ceiling (the per-device
        # chunk slice k_max is <= chunk_size; fused_chunk_increments
        # raises if the partition still lands a device over the limit).
        import dataclasses as _dc

        from ..models.epry import effective_chunk_size

        k = len(geom.schedule)
        requested = opts.chunk_size if opts.chunk_size > 0 else k
        eff = effective_chunk_size(cfg.np_size, opts.chunk_size, k, True,
                                   "batched")
        if 0 < eff < requested:
            print(f"[fpm-tpu] pallas chunked kernel: chunk_size {requested} "
                  f"exceeds the compile ceiling at Np={cfg.np_size}; "
                  f"clamped to {eff}")
            opts = _dc.replace(opts, chunk_size=eff)

    idx, s = partition_leds_by_tile(
        geom, cfg.n_large, n_tile, n_led, cfg.np_size,
        chunk_size=opts.chunk_size, chunk_assign=opts.chunk_assign,
    )
    n_chunks, k_max = idx.shape[0], idx.shape[-1]

    # Build per-device worksets in schedule order.
    order = geom.schedule
    amps_all = np.sqrt(np.asarray(images, dtype=np.float64))[order]
    starts_all = geom.crop_start[order].astype(np.int64)
    real_dtype = jnp.zeros((), dtype).real.dtype

    amps_w = np.zeros((n_chunks, n_led, n_tile, k_max, cfg.np_size, cfg.np_size))
    starts_w = np.zeros((n_chunks, n_led, n_tile, k_max, 2), dtype=np.int32)
    mask_w = np.zeros((n_chunks, n_led, n_tile, k_max))
    for ci in range(n_chunks):
        for li in range(n_led):
            for ti in range(n_tile):
                for ki, pos in enumerate(idx[ci, li, ti]):
                    if pos < 0:
                        continue
                    amps_w[ci, li, ti, ki] = amps_all[pos]
                    starts_w[ci, li, ti, ki] = [
                        starts_all[pos, 0] - ti * s, starts_all[pos, 1]
                    ]
                    mask_w[ci, li, ti, ki] = 1.0

    if initial_state is not None:  # checkpoint resume: skip the seed init
        from ..geometry import pupil_support as _pupil_support

        support = jnp.asarray(
            _pupil_support(cfg, centered=False), real_dtype).astype(dtype)
        obj_f = jnp.asarray(initial_state[0], dtype=dtype)
        pupil = jnp.asarray(initial_state[1], dtype=dtype)
    else:
        obj_f, pupil, support = init_state(
            cfg, geom, jnp.asarray(amps_all, dtype=real_dtype), dtype=dtype
        )

    obj_sh = NamedSharding(mesh, P("tile", None))
    rep = NamedSharding(mesh, P())
    w_sh = NamedSharding(mesh, P(None, "led", "tile"))
    obj_f = jax.device_put(obj_f, obj_sh)
    pupil, support = jax.device_put((pupil, support), rep)
    amps_w = jax.device_put(jnp.asarray(amps_w, dtype=real_dtype), w_sh)
    starts_w = jax.device_put(jnp.asarray(starts_w, dtype=jnp.int32), w_sh)
    mask_w = jax.device_put(jnp.asarray(mask_w, dtype=real_dtype), w_sh)
    return (obj_f, pupil, support, amps_w, starts_w, mask_w), opts, s, n_tile


def reconstruct_tile_sharded(
    images,
    geom: LEDGeometry,
    cfg: FPMConfig,
    mesh: Mesh,
    iterations: int | None = None,
    dtype=None,
    initial_state: tuple | None = None,
    **opt_overrides,
) -> ReconResult:
    """Multi-device reconstruction with the spectrum row-sharded over 'tile'.

    Combines with LED parallelism: the mesh's ``led`` axis splits each tile's
    owned LEDs. ``initial_state`` is an optional (obj_f_centered, pupil)
    pair for checkpoint resume.
    """
    args, opts, s, n_tile = prepare_tile_sharded(
        images, geom, cfg, mesh, iterations=iterations, dtype=dtype,
        initial_state=initial_state, **opt_overrides,
    )
    obj_f, pupil, obj_crop, metrics = _run_tile_sharded(
        *args, opts, mesh, s, n_tile
    )
    metrics = _fetch(metrics)
    return ReconResult(
        obj_crop=_fetch(obj_crop),
        obj_f_centered=_fetch(obj_f),
        pupil=_fetch(pupil),
        metrics={"data_residual": metrics[:, 0], "update_norm": metrics[:, 1]},
    )


def _fetch(x) -> np.ndarray:
    """Materialize a result on the host.

    Under multi-process execution the spectrum rows live on remote
    processes; ``np.asarray`` on such an array raises. Replicated arrays
    (pupil, metrics) fetch directly; row-sharded ones are all-gathered so
    every process returns the same global result (SPMD contract: all
    processes run the same program, so the collective matches up).
    """
    if getattr(x, "is_fully_addressable", True) or x.is_fully_replicated:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
