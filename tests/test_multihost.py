"""Multi-process distributed test without a cluster (SURVEY.md §4.4).

Two CPU processes with 2 fake devices each join via
``jax.distributed.initialize`` and run one LED-sharded sweep over the global
4-device mesh; process 0's result must match the single-process run.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from fpm_tpu.parallel.multihost import initialize_from_env, global_mesh
assert initialize_from_env()
import numpy as np
from fpm_tpu.data.simulate import synthetic_dataset

ds = synthetic_dataset(np_size=16, grid=5, seed=11)
tile = int(sys.argv[2])
variant = sys.argv[3] if len(sys.argv) > 3 else ""
kw = dict(iterations=3, dtype="complex128")
if variant in ("pallas", "levers"):
    # f32 fused_chunk_increments body (interpret mode on CPU) under
    # shard_map with vma=('led','tile') crossing a real process boundary.
    kw.update(dtype="complex64", chunk_size=8, use_pallas=True,
              dft_precision="highest")
if variant == "levers":
    # Both weak-scaling levers: bf16 consensus payloads + one-chunk-stale
    # pipelining, with their collectives crossing the process boundary.
    kw.update(comm_precision="bf16", stale_consensus=True)
mesh = global_mesh(tile=tile)
if tile == 1:
    from fpm_tpu.parallel.led_shard import reconstruct_led_sharded
    res = reconstruct_led_sharded(ds.images, ds.geom, ds.cfg, mesh=mesh, **kw)
else:
    from fpm_tpu.parallel.tile_shard import reconstruct_tile_sharded
    res = reconstruct_tile_sharded(ds.images, ds.geom, ds.cfg, mesh=mesh, **kw)
if jax.process_index() == 0:
    np.save(sys.argv[1], res.obj_f_centered)
"""


def _run_two_process(tmp_path, tile: int, devices_per_proc: int = 2,
                     variant: str = "") -> np.ndarray:
    port = _free_port()
    out = str(tmp_path / "objf.npy")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            FPM_COORDINATOR=f"127.0.0.1:{port}",
            FPM_NUM_PROCESSES="2",
            FPM_PROCESS_ID=str(pid),
            XLA_FLAGS=f"--xla_force_host_platform_device_count={devices_per_proc}",
            JAX_PLATFORM_NAME="cpu",
        )
        argv = [sys.executable, "-c", WORKER, out, str(tile)]
        if variant:
            argv.append(variant)
        procs.append(
            subprocess.Popen(
                argv,
                env=env,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-800:]
    return np.load(out)


def _reference():
    # Single-process reference on the local 8-device mesh (math is
    # mesh-size-invariant up to reduction order).
    from fpm_tpu.data.simulate import synthetic_dataset
    from fpm_tpu.models.epry import reconstruct

    ds = synthetic_dataset(np_size=16, grid=5, seed=11)
    return reconstruct(ds.images, ds.geom, ds.cfg, iterations=3,
                       dtype="complex128", mode="batched")


@pytest.mark.skipif(sys.platform != "linux", reason="linux-only harness")
def test_two_process_led_sharded(tmp_path):
    got = _run_two_process(tmp_path, tile=1)
    ref = _reference()
    rel = np.abs(got - ref.obj_f_centered).max() / np.abs(ref.obj_f_centered).max()
    assert rel < 1e-10


@pytest.mark.skipif(sys.platform != "linux", reason="linux-only harness")
def test_two_process_tile_sharded_pallas_body(tmp_path):
    """VERDICT r3 item 8: the fused_chunk_increments Pallas body (interpret
    mode) with vma=('led','tile') and the reverse halo, exercised across a
    real process boundary (tile=2 over 2 procs × 1 device). Must match the
    single-process chunk8 batched solve at f32 tolerance."""
    from fpm_tpu.data.simulate import synthetic_dataset
    from fpm_tpu.models.epry import reconstruct

    got = _run_two_process(tmp_path, tile=2, devices_per_proc=1,
                           variant="pallas")
    ds = synthetic_dataset(np_size=16, grid=5, seed=11)
    ref = reconstruct(ds.images, ds.geom, ds.cfg, iterations=3,
                      dtype="complex64", mode="batched", chunk_size=8)
    rel = np.abs(got - ref.obj_f_centered).max() / np.abs(ref.obj_f_centered).max()
    assert rel < 1e-5


@pytest.mark.skipif(sys.platform != "linux", reason="linux-only harness")
def test_two_process_levers_cross_process(tmp_path):
    """Both weak-scaling levers across a REAL process boundary: bf16
    consensus psums + reverse halo and one-chunk-stale pipelining
    (SCALING.md's levered projections rest on these collectives), tile=2
    over 2 procs × 1 device. Reference: the identical levered program on a
    single-process 2-device mesh — same mesh shape, same chunk partition,
    same stale trajectory; only the process layout differs."""
    import jax

    from fpm_tpu.data.simulate import synthetic_dataset
    from fpm_tpu.parallel.mesh import make_mesh
    from fpm_tpu.parallel.tile_shard import reconstruct_tile_sharded

    got = _run_two_process(tmp_path, tile=2, devices_per_proc=1,
                           variant="levers")
    ds = synthetic_dataset(np_size=16, grid=5, seed=11)
    mesh = make_mesh(led=1, tile=2, devices=jax.devices()[:2])
    ref = reconstruct_tile_sharded(
        ds.images, ds.geom, ds.cfg, mesh=mesh, iterations=3,
        dtype="complex64", chunk_size=8, use_pallas=True,
        dft_precision="highest", comm_precision="bf16", stale_consensus=True,
    )
    rel = np.abs(got - ref.obj_f_centered).max() / np.abs(ref.obj_f_centered).max()
    assert rel < 1e-5


@pytest.mark.skipif(sys.platform != "linux", reason="linux-only harness")
def test_two_process_tile_sharded_halos_cross_processes(tmp_path):
    """tile=2 over 2 procs × 1 device each: with one device per process,
    every spectrum-row halo ``ppermute`` necessarily crosses the process
    boundary — the one collective that rides DCN differently from
    intra-host ICI (global_mesh otherwise packs tile neighbors onto the
    same host). Result must still equal the single-process batched solve."""
    got = _run_two_process(tmp_path, tile=2, devices_per_proc=1)
    ref = _reference()
    rel = np.abs(got - ref.obj_f_centered).max() / np.abs(ref.obj_f_centered).max()
    assert rel < 1e-10


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port
