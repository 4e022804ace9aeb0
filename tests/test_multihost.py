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
from fpm_tpu.parallel.led_shard import reconstruct_led_sharded

ds = synthetic_dataset(np_size=16, grid=5, seed=11)
mesh = global_mesh(tile=1)
res = reconstruct_led_sharded(ds.images, ds.geom, ds.cfg, mesh=mesh,
                              iterations=3, dtype="complex128")
if jax.process_index() == 0:
    np.save(sys.argv[1], res.obj_f_centered)
"""


@pytest.mark.skipif(sys.platform != "linux", reason="linux-only harness")
def test_two_process_led_sharded(tmp_path):
    port = _free_port()
    out = str(tmp_path / "objf.npy")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            FPM_COORDINATOR=f"127.0.0.1:{port}",
            FPM_NUM_PROCESSES="2",
            FPM_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_PLATFORM_NAME="cpu",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", WORKER, out],
                env=env,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-800:]

    # Single-process reference on the local 8-device mesh (math is
    # mesh-size-invariant up to reduction order).
    from fpm_tpu.data.simulate import synthetic_dataset
    from fpm_tpu.models.epry import reconstruct

    ds = synthetic_dataset(np_size=16, grid=5, seed=11)
    ref = reconstruct(ds.images, ds.geom, ds.cfg, iterations=3,
                      dtype="complex128", mode="batched")
    got = np.load(out)
    rel = np.abs(got - ref.obj_f_centered).max() / np.abs(ref.obj_f_centered).max()
    assert rel < 1e-10


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port
