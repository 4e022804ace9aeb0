"""CLI driver — the TPU-native ``main()`` (fpmMain.cpp:500-592).

Usage mirrors the reference's ``./fpmMain <dataset.json> <iterationCount>``
(fpmMain.cpp:501-506) with real subcommands and, unlike the reference,
results written to disk (quirk 12):

    python -m fpm_tpu run dataset.json -n 10 -o out/
    python -m fpm_tpu run dataset.json 10            # positional, reference-style
    python -m fpm_tpu info dataset.json              # derived optical parameters
    python -m fpm_tpu simulate out_dir/ --np-size 32 # hermetic synthetic dataset

Device selection: ``--platform cpu|tpu`` replaces the reference's
``use_cpu.sh``/``use_gpu.sh`` OpenCL env-var scripts (SURVEY.md C11).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _add_run_parser(sub):
    p = sub.add_parser("run", help="run a reconstruction from a dataset_*.json")
    p.add_argument("config", help="dataset descriptor JSON (reference schema)")
    p.add_argument("iterations_pos", nargs="?", type=int, default=None,
                   help="iteration count (reference argv[2] style)")
    p.add_argument("-n", "--iterations", type=int, default=None)
    p.add_argument("-o", "--output", default="fpm_output")
    p.add_argument("--mode", choices=["sequential", "batched"], default="sequential")
    p.add_argument("--global-max", choices=["exact", "lazy"], default="exact")
    p.add_argument("--chunk-size", type=int, default=32,
                   help="batched mode: LEDs per Jacobi chunk (0 = whole "
                        "sweep; unstable at realistic LED counts — see "
                        "benchmarks/convergence.py)")
    p.add_argument("--chunk-assign", choices=["strided", "contiguous"],
                   default="strided",
                   help="batched mode: chunk makeup over the NA-sorted "
                        "schedule (strided spreads each chunk across the "
                        "NA range — the measured stability condition)")
    p.add_argument("--dtype", default=None, help="complex64 (TPU) or complex128 (CPU)")
    p.add_argument("--platform", choices=["cpu", "tpu"], default=None,
                   help="device selection (replaces use_cpu.sh/use_gpu.sh)")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="save a checkpoint every K iterations (0 = off)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in the output dir")
    p.add_argument("--resume-unsafe", action="store_true",
                   help="with --resume: downgrade a provenance-fingerprint "
                        "mismatch to a warning (deliberate restart under "
                        "new options, or a pre-provenance checkpoint)")
    p.add_argument("--metrics-jsonl", default=None)
    p.add_argument("--trace-dir", default=None, help="write a jax.profiler trace")
    p.add_argument("--debug", action="store_true",
                   help="dump intermediate spectra PNGs per sweep (reference "
                        "'debug' flag equivalent, fpmMain.cpp:352-455), plus "
                        "the center-LED frame (fpmMain.cpp:543)")
    p.add_argument("--debug-led", type=int, default=None, metavar="K",
                   help="with --debug: also dump the six per-LED working "
                        "spectra of schedule position K every sweep "
                        "(fpmMain.cpp:366-455)")
    p.add_argument("--no-native", action="store_true", help="force Python loader")
    p.add_argument("--fov-grid", type=int, nargs=2, metavar=("R", "C"), default=None,
                   help="large-FOV mode: reconstruct an RxC grid of "
                        "overlapping ROIs and stitch (reference covers a "
                        "single ROI only)")
    p.add_argument("--fov-overlap", type=int, default=None,
                   help="camera-pixel ROI overlap for --fov-grid (default Np/4)")
    p.add_argument("--color-mode", choices=["single", "rgb"], default="single",
                   help="'single' keeps one channel like the reference "
                        "(quirk 3: BGR channel 2 = red); 'rgb' reconstructs "
                        "all three channels independently")
    p.add_argument("--use-pallas", action="store_true",
                   help="route the sequential sweep through the fused "
                        "Pallas mega-kernel")
    p.add_argument("--dft-precision", choices=["bf16x3", "highest"],
                   default="bf16x3",
                   help="Pallas DFT matmul precision: 3-pass bf16 split "
                        "(~1e-6 rel err, ~1.3x faster) or exact f32")
    p.add_argument("--mesh", type=int, nargs=2, metavar=("LED", "TILE"),
                   default=None,
                   help="multi-device mesh: LED-batch x spectrum-tile "
                        "sharding (batched sweep semantics); TILE=1 runs "
                        "the LED-sharded sweep (replicated spectrum)")
    p.add_argument("--comm-precision", choices=["f32", "bf16"], default="f32",
                   help="mesh runs: consensus psum / reverse-halo payload "
                        "precision (bf16 halves the wire bytes; needs "
                        "--use-pallas — SCALING.md)")
    p.add_argument("--stale-consensus", action="store_true",
                   help="mesh runs: one-chunk-stale consensus pipelining "
                        "so all-reduces/halos overlap the next chunk's "
                        "compute (SCALING.md)")
    p.add_argument("--distributed", action="store_true",
                   help="initialize jax.distributed from FPM_COORDINATOR/"
                        "FPM_NUM_PROCESSES/FPM_PROCESS_ID (multi-host)")
    p.add_argument("--watchdog-timeout", type=float, default=0,
                   help="abort if no iteration chunk completes within this "
                        "many seconds (failure detection: survivors of a "
                        "dead peer hang in collectives; 0 = off). Restart "
                        "with --resume to continue from the last checkpoint")
    return p


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="fpm_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    _add_run_parser(sub)

    p_info = sub.add_parser("info", help="print derived optical parameters")
    p_info.add_argument("config")
    p_info.add_argument("--geometry", action="store_true",
                        help="also print the per-LED geometry table "
                             "(sinTheta, NA, idx_u/v, crop rect — the "
                             "reference's debug dump, fpmMain.cpp:184-234) "
                             "as JSON lines")

    p_sim = sub.add_parser("simulate", help="write a synthetic dataset to disk")
    p_sim.add_argument("out_dir")
    p_sim.add_argument("--np-size", type=int, default=32)
    p_sim.add_argument("--grid", type=int, default=7)
    p_sim.add_argument("--seed", type=int, default=0)
    p_sim.add_argument("--frame-size", type=int, default=None,
                       help="simulate full camera frames of this size "
                            "(> np-size) for large-FOV mode; cropSizeX in "
                            "the written config stays np-size")
    p_sim.add_argument("--jitter", type=float, default=0.0,
                       help="deterministic LED-position jitter as a fraction "
                            "of grid spacing; breaks the symmetric grid's "
                            "exact NA ties so the processing schedule is "
                            "unique (the reference's std::sort is unstable "
                            "on ties, fpmMain.h:111)")
    p_sim.add_argument("--darkfield-exp", type=int, default=1,
                       help="darkfieldExpMultiplier: written frames of "
                            "darkfield LEDs carry this exposure boost and "
                            "the key is written to dataset.json (the loader "
                            "divides it back out, fpmMain.cpp:128-129)")

    args = parser.parse_args(argv)
    try:
        if args.cmd == "run":
            return _cmd_run(args)
        if args.cmd == "info":
            return _cmd_info(args)
        if args.cmd == "simulate":
            return _cmd_simulate(args)
    except (OSError, ValueError) as e:
        # Clean one-line errors (the reference printed "ERROR: Could not
        # Open Directory." and friends, fpmMain.cpp:266-270). OSError also
        # covers FileNotFoundError and PIL's UnidentifiedImageError (a
        # corrupt frame in the stack must not dump a traceback). Under
        # --debug the full traceback is kept: a disk-full or permission
        # failure mid-run needs its context to be diagnosable.
        if getattr(args, "debug", False):
            raise
        print(f"ERROR: {e}", file=sys.stderr)
        return 1
    finally:
        # A --trace-dir run must flush its profile on EVERY exit path —
        # the FOV/RGB dispatches and the error paths bypass the main
        # path's inline stop_trace (idempotent; no-op when no trace).
        from .utils.profiling import stop_trace_if_active

        stop_trace_if_active()
    return 2


def _cmd_info(args) -> int:
    from .config import load_config
    from .geometry import pupil_radius

    cfg = load_config(args.config)
    out = {
        "Np": cfg.np_size,
        "ps_eff": cfg.ps_eff,
        "du": cfg.du,
        "resImprovementFactor": cfg.res_improvement_factor,
        "Nlarge": cfg.n_large,
        "recovered_pixel_size": cfg.recovered_pixel_size,
        "ledCount": cfg.led_count,
        "pupil_radius_px": pupil_radius(cfg),
    }
    print(json.dumps(out, indent=2))
    if args.geometry:
        # Per-LED geometry table — the reference's per-LED debug dump
        # (LED number, sinθ, NA, idx_u/v, crop rect; fpmMain.cpp:184-234)
        # as machine-readable JSON lines instead of stdout prose.
        import numpy as np

        from .geometry import compute_geometry

        geom = compute_geometry(cfg)
        for i in range(geom.num_leds):
            print(json.dumps({
                "led": int(geom.led_numbers[i]),
                "sinTheta_x": float(geom.sin_theta[i, 0]),
                "sinTheta_y": float(geom.sin_theta[i, 1]),
                "illumination_na": float(geom.illumination_na[i]),
                "idx_u": int(geom.idx_uv[i, 0]),
                "idx_v": int(geom.idx_uv[i, 1]),
                "cropYStart": int(geom.crop_start[i, 0]),
                "cropXStart": int(geom.crop_start[i, 1]),
                "cropSize": cfg.np_size,
                "darkfield": bool(geom.is_darkfield[i]),
                "schedule_position": int(np.argmax(geom.schedule == i)),
            }))
    return 0


def _cmd_simulate(args) -> int:
    import numpy as np
    from PIL import Image

    from .data.simulate import synthetic_dataset

    if args.grid < 1:
        raise ValueError(f"--grid must be >= 1, got {args.grid}")
    if args.np_size < 4:
        raise ValueError(f"--np-size must be >= 4, got {args.np_size}")
    sim_size = args.frame_size or args.np_size
    if sim_size < args.np_size:
        raise ValueError("--frame-size must be >= --np-size")
    ds = synthetic_dataset(np_size=sim_size, grid=args.grid, seed=args.seed,
                           quantize=True, raw_frames=True, jitter=args.jitter,
                           darkfield_exp_multiplier=args.darkfield_exp)
    os.makedirs(args.out_dir, exist_ok=True)
    # Write TIFFs in the reference's file layout ({prefix}{led#}{ext}) so the
    # full scan/decode ingestion path is exercised hermetically.
    for i, led in enumerate(ds.geom.led_numbers):
        Image.fromarray(ds.images[i].astype(np.uint16)).save(
            os.path.join(args.out_dir, f"iLED_{led}.tif")
        )
    cfg_doc = {
        "datasetRoot": os.path.abspath(args.out_dir) + os.sep,
        "filePrefix": "iLED_",
        "fileExtension": ".tif",
        "cropSizeX": args.np_size,
        "pixelSize": ds.cfg.pixel_size,
        "objectiveMag": ds.cfg.objective_mag,
        "objectiveNA": ds.cfg.objective_na,
        "maxIlluminationNA": ds.cfg.max_illumination_na,
        "lambda": ds.cfg.wavelength,
        "cropX": 0, "cropY": 0,
        "bk1cropX": 0, "bk1cropY": 0, "bk2cropX": 0, "bk2cropY": 0,
        "bgThresh": 0,
        "darkfieldExpMultiplier": args.darkfield_exp,
        "delta1": ds.cfg.delta1, "delta2": ds.cfg.delta2,
        "ledCount": int(ds.cfg.led_count),
        "holeCoordinates": [
            [{"x": float(x)}, {"y": float(y)}, {"z": float(z)}]
            for x, y, z in ds.cfg.hole_coordinates
        ],
    }
    cfg_path = os.path.join(args.out_dir, "dataset.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg_doc, f)
    np.save(os.path.join(args.out_dir, "object_true.npy"), ds.object_true)
    print(f"wrote {ds.geom.num_leds} LED frames + {cfg_path}")
    return 0


def _cmd_run(args) -> int:
    if args.platform:
        os.environ["JAX_PLATFORM_NAME"] = args.platform
        if args.platform == "cpu":
            os.environ.setdefault("JAX_ENABLE_X64", "1")

    import numpy as np

    from .config import load_config
    from .data.loader import load_dataset
    from .models.epry import reconstruct
    from .utils.checkpoint import (
        fingerprint,
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )
    from .utils.metrics import MetricsLogger
    from .utils.outputs import save_results
    from .utils.profiling import phase, start_trace, stop_trace

    if args.distributed:
        from .parallel.multihost import initialize_from_env

        initialize_from_env(require=True)

    iterations = args.iterations if args.iterations is not None else args.iterations_pos
    cfg = load_config(args.config, iterations=iterations)
    if cfg.iterations < 1:
        raise ValueError(f"iteration count must be >= 1, got {cfg.iterations}")
    if args.dtype:
        import numpy as _np

        try:
            _dt = _np.dtype(args.dtype)
        except TypeError:
            raise ValueError(f"unknown --dtype {args.dtype!r}") from None
        if _dt not in (_np.dtype(_np.complex64), _np.dtype(_np.complex128)):
            raise ValueError(
                f"--dtype must be complex64 or complex128, got {args.dtype!r} "
                "(the solver state is complex; real dtypes would silently "
                "discard phase)"
            )
        cfg.dtype = _dt.name  # canonical spelling (accepts aliases like c16)
    if args.debug:
        cfg.debug = True

    if args.fov_grid and args.color_mode == "rgb":
        raise ValueError("--fov-grid and --color-mode rgb are not supported "
                         "together (tile the channels as separate runs)")
    if args.mesh and args.color_mode == "rgb":
        raise ValueError("--color-mode rgb does not support --mesh (the "
                         "three channels already batch in one program)")
    if args.mesh and args.fov_grid:
        raise ValueError("--fov-grid auto-shards ROIs over all devices; "
                         "--mesh is not supported with it")

    # Multi-host runs: exactly one process owns the output directory
    # (checkpoints, results, metrics) — concurrent writers would tear the
    # atomic checkpoint rename and interleave the metrics stream.
    args._is_coordinator = True
    if args.distributed:
        from .parallel.multihost import is_coordinator

        args._is_coordinator = is_coordinator()

    os.makedirs(args.output, exist_ok=True)
    logger = MetricsLogger(
        (args.metrics_jsonl or os.path.join(args.output, "metrics.jsonl"))
        if args._is_coordinator else None,
        resume=bool(args.resume),
    )
    logger.log("config", path=os.path.abspath(args.config),
               iterations=cfg.iterations, n_large=cfg.n_large, np_size=cfg.np_size)

    if args.trace_dir:
        start_trace(args.trace_dir)

    if args.fov_grid:
        return _run_large_fov(args, cfg, logger)
    if args.color_mode == "rgb":
        return _run_rgb(args, cfg, logger)

    with phase("ingest", logger):
        dataset = load_dataset(cfg, use_native=False if args.no_native else None)
    logger.log("dataset", leds=int(dataset.geom.num_leds))
    print(f"[fpm-tpu] loaded {dataset.geom.num_leds} LED frames "
          f"(Np={cfg.np_size}, Nlarge={cfg.n_large})")

    # --mesh flag, or the config's tileGrid key (the fpm-tpu extension
    # that makes the cellscope2 "tiled" config self-describing). Resolved
    # before the fingerprint so provenance records what actually runs:
    # mesh runs always use batched (chunked-Jacobi) sweep semantics.
    mesh_req = args.mesh or (
        list(cfg.tile_grid) if tuple(cfg.tile_grid) != (1, 1) else None
    )
    effective_mode = "batched" if mesh_req else args.mode
    # Chunk clamping (Pallas compile ceiling, LED-shard divisibility
    # round-up) can move the requested chunk; record what will actually
    # execute, not what was requested. effective_chunk_size is the same
    # function every solver path clamps with; a pure LED mesh ("led p 1")
    # scales the ceiling by n_led and rounds up to a multiple of it, the
    # tile mesh and single-device paths clamp at n_led=1.
    from .models.epry import effective_chunk_size

    n_led_fp = mesh_req[0] if (mesh_req and mesh_req[1] == 1) else 1
    eff_chunk = effective_chunk_size(
        cfg.np_size, args.chunk_size, int(dataset.geom.num_leds),
        bool(args.use_pallas), effective_mode, n_led=n_led_fp,
    )

    # Provenance fingerprint: everything that changes the iteration
    # trajectory (problem shape, LED schedule, solver mode/chunking,
    # precision). Stored in every checkpoint; --resume refuses a
    # checkpoint written under a different one (silent divergence).
    run_fp = fingerprint(
        cfg, dataset.geom,
        mode=effective_mode, chunk_size=eff_chunk,
        chunk_assign=args.chunk_assign, global_max=args.global_max,
        use_pallas=bool(args.use_pallas), dft_precision=args.dft_precision,
        comm_precision=args.comm_precision,
        stale_consensus=bool(args.stale_consensus),
        mesh="x".join(map(str, mesh_req)) if mesh_req else None,
    )
    logger.log("solver_options", mode=effective_mode,
               chunk_size=eff_chunk, chunk_assign=args.chunk_assign,
               global_max=args.global_max, use_pallas=bool(args.use_pallas),
               dft_precision=args.dft_precision,
               comm_precision=args.comm_precision,
               stale_consensus=bool(args.stale_consensus),
               mesh=list(mesh_req) if mesh_req else None)

    initial_state, start_iter = None, 0
    if args.resume:
        ck = latest_checkpoint(args.output)
        if ck:
            obj_f, pupil, start_iter = load_checkpoint(
                ck, expect=run_fp, strict=not args.resume_unsafe
            )
            initial_state = (obj_f, pupil)
            print(f"[fpm-tpu] resuming from {ck} (iteration {start_iter})")

    total = cfg.iterations
    if start_iter >= total:
        raise ValueError(
            f"checkpoint is already at iteration {start_iter} >= the "
            f"requested total {total}; nothing to resume (raise -n to "
            "extend the run)"
        )
    chunk = args.checkpoint_every if args.checkpoint_every > 0 else total
    if cfg.debug:
        # Reference 'debug' mode shows intermediate spectra during the solve
        # (fpmMain.cpp:352-455); we dump them as PNGs per sweep instead.
        chunk = 1
        os.makedirs(os.path.join(args.output, "debug"), exist_ok=True)

    result = None
    if args.use_pallas and args.dft_precision == "bf16x3":
        print("[fpm-tpu] pallas DFT precision: bf16x3 (~1e-6 rel err; "
              "--dft-precision highest for exact f32)")
    with phase("solve", logger):
        solver_kwargs = dict(mode=args.mode, global_max=args.global_max,
                             chunk_size=args.chunk_size,
                             chunk_assign=args.chunk_assign)
        if mesh_req:
            from .parallel import (
                make_mesh,
                reconstruct_led_sharded,
                reconstruct_tile_sharded,
            )

            mesh = make_mesh(led=mesh_req[0], tile=mesh_req[1])
            print(f"[fpm-tpu] mesh: led={mesh_req[0]} tile={mesh_req[1]} "
                  f"({len(mesh.devices.ravel())} devices)")

            # Forward the full solver-option set: the mesh path runs
            # batched (chunked-Jacobi) semantics, and chunk_size /
            # chunk_assign / use_pallas / dft_precision / comm_precision /
            # stale_consensus all change the trajectory (chunk_size=0
            # whole-sweep Jacobi is unstable at realistic LED counts —
            # models/epry.py).
            mesh_kwargs = dict(
                global_max=args.global_max,
                chunk_size=args.chunk_size,
                chunk_assign=args.chunk_assign,
                use_pallas=args.use_pallas,
                dft_precision=args.dft_precision,
                comm_precision=args.comm_precision,
                stale_consensus=args.stale_consensus,
            )

            if mesh_req[1] == 1:
                # Pure LED-batch sharding (replicated spectrum).
                def run_chunk(step, initial_state):
                    return reconstruct_led_sharded(
                        dataset.images, dataset.geom, cfg, mesh=mesh,
                        iterations=step, initial_state=initial_state,
                        **mesh_kwargs,
                    )
            else:
                def run_chunk(step, initial_state):
                    return reconstruct_tile_sharded(
                        dataset.images, dataset.geom, cfg, mesh=mesh,
                        iterations=step, initial_state=initial_state,
                        **mesh_kwargs,
                    )
        else:
            def run_chunk(step, initial_state):
                return reconstruct(
                    dataset.images, dataset.geom, cfg,
                    iterations=step, initial_state=initial_state,
                    use_pallas=args.use_pallas,
                    dft_precision=args.dft_precision, **solver_kwargs,
                )

        if cfg.debug and args.debug_led is not None:
            # Replays need the sweep-entry state; materialize the init
            # contract for the first sweep (fpmMain.cpp:301-343). Complex
            # buffers must not cross host↔device (axon tunnel limitation),
            # so the init runs in a jit with real-plane outputs.
            import functools as _ft

            import jax as _jax
            import jax.numpy as _jnp

            from .geometry import pupil_support as _pupil_support
            from .models.epry import EPRYOptions as _EPRYOptions
            from .models.epry import _planes, init_traced

            _opts = _EPRYOptions.from_config(cfg, dtype="complex64",
                                             collect_metrics=False)

            @_ft.partial(_jax.jit, static_argnames=("opts",))
            def _init_planes(amps, support_r, opts):
                obj_f, pupil = init_traced(amps, support_r, opts)
                return _planes(obj_f), _planes(pupil)

            _amps = _jnp.asarray(
                np.sqrt(np.asarray(dataset.images, np.float64))[dataset.geom.schedule],
                _jnp.float32,
            )
            _sup = _jnp.asarray(_pupil_support(cfg, centered=False), _jnp.float32)
            o_pl, p_pl = _init_planes(_amps, _sup, _opts)
            o_pl, p_pl = np.asarray(o_pl), np.asarray(p_pl)
            debug_led_state = (o_pl[0] + 1j * o_pl[1], p_pl[0] + 1j * p_pl[1])
        if cfg.debug:
            # centerLED debug image (fpmMain.cpp:543): save the center LED's
            # preprocessed frame if it is present in the stack.
            from .utils.outputs import save_png

            where = np.nonzero(dataset.geom.led_numbers == cfg.center_led)[0]
            if where.size:
                frame = np.asarray(dataset.images[int(where[0])], np.float64)
                save_png(os.path.join(args.output, "debug",
                                      f"center_led_{cfg.center_led}.png"),
                         frame / (frame.max() + 1e-30))
            else:
                print(f"[fpm-tpu] debug: centerLED {cfg.center_led} not in "
                      "the loaded stack; skipping its debug image")

        watchdog = None
        if args.watchdog_timeout > 0:
            from .utils.watchdog import Watchdog

            # Started lazily after the FIRST chunk: the first dispatch
            # includes XLA/Pallas compilation (minutes on a cold cache),
            # which must not count as a stall.
            watchdog = Watchdog(args.watchdog_timeout)
            if chunk >= total:
                print("[fpm-tpu] watchdog: no intermediate chunks "
                      "(--checkpoint-every 0) — progress is only observable "
                      "once per full solve")
        done = start_iter
        while done < total:
            step = min(chunk, total - done)
            if cfg.debug and args.debug_led is not None:
                # Per-LED working spectra at this sweep's entry state — the
                # reference's six mid-update windows (fpmMain.cpp:366-455).
                from .models.epry import led_intermediates
                from .utils.outputs import SHOW_COMPLEX_MAG, save_complex_img

                state = initial_state if initial_state is not None else debug_led_state
                inter = led_intermediates(state, dataset.images, dataset.geom,
                                          cfg, args.debug_led)
                base = os.path.join(args.output, "debug",
                                    f"iter{done + 1:04d}_led{args.debug_led:04d}")
                for name, arr in inter.items():
                    save_complex_img(arr, SHOW_COMPLEX_MAG, f"{base}_{name}")
            result = run_chunk(step, initial_state)
            done += step
            if watchdog is not None:
                watchdog.beat() if watchdog.running else watchdog.start()
            initial_state = (result.obj_f_centered, result.pupil)
            logger.log("iterations", done=done,
                       data_residual=float(result.metrics["data_residual"][-1]),
                       update_norm=float(result.metrics["update_norm"][-1]))
            if cfg.debug:
                from .utils.outputs import SHOW_COMPLEX_MAG, save_complex_img

                base = os.path.join(args.output, "debug", f"iter{done:04d}")
                save_complex_img(result.obj_f_centered, SHOW_COMPLEX_MAG,
                                 base + "_objF")
                save_complex_img(np.fft.fftshift(result.pupil), SHOW_COMPLEX_MAG,
                                 base + "_pupil")
            if (args._is_coordinator and args.checkpoint_every > 0
                    and done < total
                    and (done - start_iter) % args.checkpoint_every == 0):
                # Offset by start_iter: a resume from a checkpoint that is
                # not aligned to the current interval (the interval is
                # deliberately NOT in the fingerprint) must keep
                # checkpointing every K sweeps, not never again.
                save_checkpoint(
                    os.path.join(args.output, f"ckpt_{done}.npz"),
                    result.obj_f_centered, result.pupil, done,
                    meta=run_fp,
                )
        if watchdog is not None:
            watchdog.stop()

    if args._is_coordinator:
        with phase("output", logger):
            save_results(result, args.output, cfg)

    if args.trace_dir:
        stop_trace()
    logger.close()
    print(f"[fpm-tpu] results written to {args.output}")
    return 0


def _run_large_fov(args, cfg, logger) -> int:
    import jax
    import numpy as np

    from .data.loader import load_dataset
    from .models.epry import effective_chunk_size
    from .models.largefov import reconstruct_large_fov
    from .utils.checkpoint import TileStore, fingerprint
    from .utils.outputs import SHOW_AMP_PHASE, save_complex_img
    from .utils.profiling import phase

    with phase("ingest", logger):
        dataset = load_dataset(cfg, full_frames=True,
                               use_native=False if args.no_native else None)
    rows, cols = args.fov_grid
    eff_chunk = effective_chunk_size(
        cfg.np_size, args.chunk_size, int(dataset.geom.num_leds),
        bool(args.use_pallas), args.mode,
    )
    solver_kwargs = dict(
        mode=args.mode, global_max=args.global_max,
        chunk_size=args.chunk_size, chunk_assign=args.chunk_assign,
        use_pallas=args.use_pallas, dft_precision=args.dft_precision,
    )

    # Per-tile fault tolerance (the production long-running mode): any
    # --checkpoint-every > 0 enables per-tile persistence under
    # out/tiles/; --resume loads completed tiles (fingerprint-checked)
    # instead of re-solving them. Tile granularity — the per-sweep
    # interval doesn't apply to independent per-tile solves.
    # Unlike sweep checkpoints (which may be extended by resuming), a
    # persisted tile is a COMPLETE solve — its content depends on the total
    # iteration count, so iterations is part of the tile fingerprint.
    run_fp = fingerprint(
        cfg, dataset.geom, fov_grid=f"{rows}x{cols}",
        iterations=int(cfg.iterations),
        fov_overlap=args.fov_overlap, mode=args.mode,
        chunk_size=eff_chunk, chunk_assign=args.chunk_assign,
        global_max=args.global_max, use_pallas=bool(args.use_pallas),
        dft_precision=args.dft_precision,
    )
    tile_store = None
    if (args.checkpoint_every > 0 or args.resume) and args._is_coordinator:
        tile_store = TileStore(
            os.path.join(args.output, "tiles"), meta=run_fp,
            resume=bool(args.resume), strict=not args.resume_unsafe,
        )

    watchdog = None
    if args.watchdog_timeout > 0:
        from .utils.watchdog import Watchdog

        # started at the first completed tile (the first includes compile)
        watchdog = Watchdog(args.watchdog_timeout)

    def on_tile(r, c, t):
        logger.log("tile", row=r, col=c,
                   data_residual=float(t.metrics["data_residual"][-1]))
        if watchdog is not None:
            watchdog.beat() if watchdog.running else watchdog.start()

    n_dev = jax.device_count()
    with phase("solve", logger):
        if n_dev > 1:
            # ROI parallelism: the production scale-out mode (SCALING.md) —
            # every device solves its own tiles, zero per-sweep collectives.
            from .parallel.roi_shard import (
                make_roi_mesh,
                reconstruct_large_fov_sharded,
            )

            print(f"[fpm-tpu] large-FOV: {rows}x{cols} tiles of "
                  f"Np={cfg.np_size}, ROI-sharded over {n_dev} devices")
            logger.log("solver_options", fov_grid=[rows, cols],
                       roi_devices=n_dev,
                       **{**solver_kwargs, "chunk_size": eff_chunk})
            res = reconstruct_large_fov_sharded(
                dataset.images, dataset.geom, cfg,
                grid=(rows, cols), overlap=args.fov_overlap,
                mesh=make_roi_mesh(), progress=on_tile,
                tile_store=tile_store, **solver_kwargs,
            )
        else:
            print(f"[fpm-tpu] large-FOV: {rows}x{cols} tiles of Np={cfg.np_size}")
            res = reconstruct_large_fov(
                dataset.images, dataset.geom, cfg,
                grid=(rows, cols), overlap=args.fov_overlap,
                progress=on_tile, tile_store=tile_store, **solver_kwargs,
            )
    if watchdog is not None:
        watchdog.stop()

    if args._is_coordinator:
        with phase("output", logger):
            np.save(os.path.join(args.output, "object_stitched.npy"), res.stitched)
            save_complex_img(res.stitched, SHOW_AMP_PHASE,
                             os.path.join(args.output, "object_stitched"))
    logger.close()
    print(f"[fpm-tpu] stitched {rows * cols} tiles -> {args.output}")
    return 0


def _run_rgb(args, cfg, logger) -> int:
    import numpy as np

    from .data.loader import load_dataset_rgb
    from .models.epry import effective_chunk_size, reconstruct_channels
    from .utils.checkpoint import (
        fingerprint,
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )
    from .utils.outputs import save_png, save_results
    from .utils.profiling import phase

    # Decode-once ingestion: every TIFF is read and parsed a single time and
    # all three channels are preprocessed from that one decode (bit-identical
    # to three per-channel loads; tests/test_loader.py pins it). Peak host
    # memory holds all three uint16 channel stacks at once (vs one for a
    # per-channel loop) — the price of decoding each file once.
    with phase("ingest[rgb]", logger):
        channels = load_dataset_rgb(
            cfg, use_native=False if args.no_native else None
        )
    geom = channels[0].geom

    # The three channels are identical-shape independent problems sharing
    # one geometry; they solve as ONE compiled program with a channel axis
    # (models/epry.py reconstruct_channels) — bitwise-identical to three
    # sequential solves (tests/test_solver_parity.py pins it).
    eff_chunk = effective_chunk_size(
        cfg.np_size, args.chunk_size, int(geom.num_leds),
        bool(args.use_pallas), args.mode,
    )
    solver_kwargs = dict(mode=args.mode, global_max=args.global_max,
                         chunk_size=args.chunk_size,
                         chunk_assign=args.chunk_assign,
                         use_pallas=args.use_pallas,
                         dft_precision=args.dft_precision)
    run_fp = fingerprint(
        cfg, geom, color_mode="rgb", mode=args.mode, chunk_size=eff_chunk,
        chunk_assign=args.chunk_assign, global_max=args.global_max,
        use_pallas=bool(args.use_pallas), dft_precision=args.dft_precision,
    )
    logger.log("solver_options", color_mode="rgb", channels=3,
               chunk_size=eff_chunk, **{k: v for k, v in
                                        solver_kwargs.items()
                                        if k != "chunk_size"})

    # Same sweep-granular checkpoint/resume contract as the single-ROI
    # path: the stacked (3, ...) channel state checkpoints every
    # --checkpoint-every sweeps under the provenance fingerprint.
    initial_state, start_iter = None, 0
    if args.resume:
        ck = latest_checkpoint(args.output)
        if ck:
            obj_f, pupil, start_iter = load_checkpoint(
                ck, expect=run_fp, strict=not args.resume_unsafe
            )
            initial_state = (obj_f, pupil)
            print(f"[fpm-tpu] resuming from {ck} (iteration {start_iter})")

    total = cfg.iterations
    if start_iter >= total:
        raise ValueError(
            f"checkpoint is already at iteration {start_iter} >= the "
            f"requested total {total}; nothing to resume (raise -n to "
            "extend the run)"
        )
    chunk = args.checkpoint_every if args.checkpoint_every > 0 else total
    watchdog = None
    if args.watchdog_timeout > 0:
        from .utils.watchdog import Watchdog

        watchdog = Watchdog(args.watchdog_timeout)  # started after chunk 1

    results = None
    with phase("solve[rgb]", logger):
        done = start_iter
        while done < total:
            step = min(chunk, total - done)
            results = reconstruct_channels(
                [d.images for d in channels], geom, cfg,
                iterations=step, initial_state=initial_state,
                **solver_kwargs,
            )
            done += step
            if watchdog is not None:
                watchdog.beat() if watchdog.running else watchdog.start()
            initial_state = (
                np.stack([r.obj_f_centered for r in results]),
                np.stack([r.pupil for r in results]),
            )
            logger.log("iterations", done=done, **{
                name: float(r.metrics["data_residual"][-1])
                for name, r in zip(("red", "green", "blue"), results)
            })
            if (args._is_coordinator and args.checkpoint_every > 0
                    and done < total
                    and (done - start_iter) % args.checkpoint_every == 0):
                save_checkpoint(
                    os.path.join(args.output, f"ckpt_{done}.npz"),
                    initial_state[0], initial_state[1], done, meta=run_fp,
                )
    if watchdog is not None:
        watchdog.stop()

    if args._is_coordinator:
        amps = []
        for name, res, dataset in zip(("red", "green", "blue"), results, channels):
            save_results(res, os.path.join(args.output, name), dataset.cfg)
            amps.append(np.abs(res.obj_crop))
        rgb = np.stack(amps, axis=-1)
        rgb = rgb / (rgb.max() + 1e-30)
        save_png(os.path.join(args.output, "object_rgb.png"), rgb)
    logger.close()
    print(f"[fpm-tpu] RGB reconstruction -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
