"""Failure detection + kill-and-resume fault injection (SURVEY.md §5).

The reference loses everything on any failure (state only in RAM, GUI-only
output). The TPU build's contract, exercised end-to-end here on the
2-process CPU harness (SURVEY.md §4.4):

* a peer process dying mid-solve is *detected* (the survivor either errors
  on the broken collective or is aborted by the Watchdog instead of holding
  its chips forever), and
* restarting from the latest atomic checkpoint reproduces the uninterrupted
  run **bitwise** (VERDICT r3 item 7).
"""

import os
import signal
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

from fpm_tpu.utils.watchdog import Watchdog

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FAULT_WORKER = r"""
import os, signal, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from fpm_tpu.parallel.multihost import initialize_from_env, global_mesh
assert initialize_from_env()
import numpy as np
from fpm_tpu.data.simulate import synthetic_dataset
from fpm_tpu.parallel.tile_shard import reconstruct_tile_sharded
from fpm_tpu.utils.checkpoint import (latest_checkpoint, load_checkpoint,
                                      save_checkpoint)
from fpm_tpu.utils.watchdog import Watchdog

out_dir, total, crash_after = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
ds = synthetic_dataset(np_size=16, grid=5, seed=11)
mesh = global_mesh(tile=2)

state, start = None, 0
ck = latest_checkpoint(out_dir)
if ck:
    o, p, start = load_checkpoint(ck)
    state = (o, p)

# Failure detection: if the peer dies, this process would hang in the next
# collective; the watchdog aborts it instead (exit 42).
wd = Watchdog(timeout=45).start()
res = None
for it in range(start, total):
    res = reconstruct_tile_sharded(ds.images, ds.geom, ds.cfg, mesh=mesh,
                                   iterations=1, initial_state=state,
                                   dtype="complex128")
    wd.beat()
    state = (res.obj_f_centered, res.pupil)
    if jax.process_index() == 0:
        save_checkpoint(os.path.join(out_dir, f"ckpt_{it + 1}.npz"),
                        res.obj_f_centered, res.pupil, it + 1)
    if crash_after == it + 1 and jax.process_index() == 1:
        os.kill(os.getpid(), signal.SIGKILL)  # abrupt mid-run host death
wd.stop()
if jax.process_index() == 0:
    np.save(os.path.join(out_dir, "final.npy"), res.obj_f_centered)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch_pair(out_dir, total, crash_after):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            FPM_COORDINATOR=f"127.0.0.1:{port}",
            FPM_NUM_PROCESSES="2",
            FPM_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
            JAX_PLATFORM_NAME="cpu",
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", FAULT_WORKER, out_dir, str(total),
             str(crash_after)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        ))
    return procs


def _wait_all(procs, timeout=300):
    deadline = time.time() + timeout
    outs = []
    for p in procs:
        try:
            outs.append(p.communicate(timeout=max(1.0, deadline - time.time())))
        except subprocess.TimeoutExpired:
            p.kill()
            outs.append(p.communicate())
    return outs


@pytest.mark.skipif(sys.platform != "linux", reason="linux-only harness")
def test_kill_one_process_resume_bitwise(tmp_path):
    """Process 1 is SIGKILLed after iteration 2 of 4; the survivor is
    detected-failed (collective error or watchdog abort, never a silent
    success); a fresh 2-process run resumes from the atomic checkpoint and
    reproduces the uninterrupted run's spectrum bitwise."""
    # Uninterrupted 4-iteration run → golden final state.
    dir_a = str(tmp_path / "a")
    os.makedirs(dir_a)
    outs = _wait_all(_launch_pair(dir_a, total=4, crash_after=-1))
    assert all(os.path.exists(os.path.join(dir_a, f)) for f in
               ("ckpt_4.npz", "final.npy")), outs[0][1].decode()[-800:]
    golden = np.load(os.path.join(dir_a, "final.npy"))

    # Crash run: proc 1 dies abruptly after iteration 2's checkpoint.
    dir_b = str(tmp_path / "b")
    os.makedirs(dir_b)
    procs = _launch_pair(dir_b, total=4, crash_after=2)
    outs = _wait_all(procs, timeout=240)
    assert procs[1].returncode == -signal.SIGKILL
    # Detection contract: the survivor must NOT report success.
    assert procs[0].returncode != 0, (
        f"survivor exited 0 despite dead peer: {outs[0][0].decode()[-400:]}")
    assert not os.path.exists(os.path.join(dir_b, "final.npy"))
    ck = sorted(f for f in os.listdir(dir_b) if f.startswith("ckpt_"))
    assert "ckpt_2.npz" in ck  # atomic checkpoint survived the crash

    # Restart (supervisor action): resumes from the latest checkpoint.
    outs = _wait_all(_launch_pair(dir_b, total=4, crash_after=-1))
    assert os.path.exists(os.path.join(dir_b, "final.npy")), \
        outs[0][1].decode()[-800:]
    resumed = np.load(os.path.join(dir_b, "final.npy"))
    np.testing.assert_array_equal(resumed, golden)


def test_watchdog_fires_on_stall():
    fired = []
    wd = Watchdog(timeout=0.2, on_timeout=lambda: fired.append(1),
                  poll_interval=0.05).start()
    try:
        deadline = time.time() + 5
        while not fired and time.time() < deadline:
            time.sleep(0.05)
    finally:
        wd.stop()
    assert fired


def test_watchdog_beats_prevent_firing():
    fired = []
    with Watchdog(timeout=0.4, on_timeout=lambda: fired.append(1),
                  poll_interval=0.05) as wd:
        for _ in range(10):
            wd.beat()
            time.sleep(0.1)
    assert not fired


def test_watchdog_rejects_bad_timeout():
    with pytest.raises(ValueError):
        Watchdog(timeout=0)


# ---------------------------------------------------------------- production
# fault tolerance for the long-running CLI modes (--fov-grid, --color-mode
# rgb): kill an in-flight run, resume, and require the final result bitwise
# AND completed work not re-done (VERDICT r4 missing #3).

def _cli_env(n_devices=1):
    env = dict(os.environ)
    env.update(JAX_PLATFORM_NAME="cpu", JAX_ENABLE_X64="1",
               XLA_FLAGS=f"--xla_force_host_platform_device_count={n_devices}")
    env.pop("JAX_PLATFORMS", None)
    return env


def _popen_cli(args, n_devices=1):
    return subprocess.Popen(
        [sys.executable, "-m", "fpm_tpu"] + args, env=_cli_env(n_devices),
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE)


def _run_cli(args, n_devices=1, timeout=600):
    p = _popen_cli(args, n_devices)
    out, err = p.communicate(timeout=timeout)
    assert p.returncode == 0, err.decode()[-1500:]
    return out.decode()


def _tile_events(out_dir):
    import json as _json

    with open(os.path.join(out_dir, "metrics.jsonl")) as f:
        return [ln for ln in map(_json.loads, f) if ln["event"] == "tile"]


@pytest.mark.skipif(sys.platform != "linux", reason="linux-only harness")
def test_fov_grid_kill_resume_bitwise(tmp_path):
    """SIGKILL an in-flight ROI-sharded --fov-grid 3 3 run after >=1 tile
    completed; --resume must skip the persisted tiles and the final stitch
    must be bitwise-identical to an uninterrupted run."""
    data = str(tmp_path / "data")
    _run_cli(["simulate", data, "--np-size", "16", "--grid", "5",
              "--frame-size", "48"])
    cfg = os.path.join(data, "dataset.json")
    fov = ["run", cfg, "-n", "4", "-o", None, "--platform", "cpu",
           "--dtype", "complex128", "--no-native", "--fov-grid", "3", "3",
           "--checkpoint-every", "1"]

    # Golden uninterrupted run (2 fake devices -> ROI-sharded rounds of 2).
    out_a = str(tmp_path / "a")
    fov_a = [a if a is not None else out_a for a in fov]
    stdout = _run_cli(fov_a, n_devices=2)
    assert "ROI-sharded over 2 devices" in stdout
    golden = np.load(os.path.join(out_a, "object_stitched.npy"))
    assert len(_tile_events(out_a)) == 9

    # Kill run: SIGKILL as soon as at least one tile file is persisted.
    out_b = str(tmp_path / "b")
    fov_b = [a if a is not None else out_b for a in fov]
    proc = _popen_cli(fov_b, n_devices=2)
    tiles_dir = os.path.join(out_b, "tiles")
    deadline = time.time() + 240
    while time.time() < deadline:
        done = os.path.isdir(tiles_dir) and [
            f for f in os.listdir(tiles_dir)
            if f.endswith(".npz") and not f.endswith(".tmp")]
        if done:
            break
        if proc.poll() is not None:
            raise AssertionError(
                "run finished before the kill could be injected: "
                + proc.communicate()[1].decode()[-800:])
        time.sleep(0.02)
    else:
        proc.kill()
        raise AssertionError("no tile checkpoint appeared within 240 s")
    os.kill(proc.pid, signal.SIGKILL)
    proc.communicate()
    assert proc.returncode == -signal.SIGKILL
    assert not os.path.exists(os.path.join(out_b, "object_stitched.npy"))
    survived = sorted(f for f in os.listdir(tiles_dir) if f.endswith(".npz"))
    assert survived  # atomic per-tile persistence outlived the SIGKILL
    mtimes = {f: os.path.getmtime(os.path.join(tiles_dir, f))
              for f in survived}
    n_pre = len(_tile_events(out_b))  # events the killed run got to log

    # Resume: completed tiles are loaded, not re-solved; stitch is bitwise.
    _run_cli(fov_b + ["--resume"], n_devices=2)
    resumed = np.load(os.path.join(out_b, "object_stitched.npy"))
    np.testing.assert_array_equal(resumed, golden)
    # The (appending) metrics log gains one "tile" event per RE-SOLVED tile.
    assert len(_tile_events(out_b)) - n_pre == 9 - len(survived)
    for f in survived:  # untouched on disk -> provably not re-solved
        assert os.path.getmtime(os.path.join(tiles_dir, f)) == mtimes[f]


@pytest.mark.skipif(sys.platform != "linux", reason="linux-only harness")
def test_rgb_kill_resume_bitwise(tmp_path):
    """SIGKILL an in-flight --color-mode rgb run after a sweep checkpoint;
    --resume must continue from it and finish bitwise-identical to an
    uninterrupted run (same contract as the single-ROI path, now wired to
    the RGB batched-channel solve)."""
    data = str(tmp_path / "data")
    _run_cli(["simulate", data, "--np-size", "16", "--grid", "5"])
    cfg = os.path.join(data, "dataset.json")
    rgb = ["run", cfg, "-n", "4", "-o", None, "--platform", "cpu",
           "--dtype", "complex128", "--no-native", "--color-mode", "rgb",
           "--checkpoint-every", "1"]

    out_a = str(tmp_path / "a")
    _run_cli([a if a is not None else out_a for a in rgb])
    golden = np.load(os.path.join(out_a, "green", "object.npy"))

    out_b = str(tmp_path / "b")
    rgb_b = [a if a is not None else out_b for a in rgb]
    proc = _popen_cli(rgb_b)
    deadline = time.time() + 240
    while time.time() < deadline:
        if os.path.exists(os.path.join(out_b, "ckpt_1.npz")):
            break
        if proc.poll() is not None:
            raise AssertionError(
                "run finished before the kill could be injected: "
                + proc.communicate()[1].decode()[-800:])
        time.sleep(0.02)
    else:
        proc.kill()
        raise AssertionError("no checkpoint appeared within 240 s")
    os.kill(proc.pid, signal.SIGKILL)
    proc.communicate()
    assert proc.returncode == -signal.SIGKILL
    assert not os.path.exists(os.path.join(out_b, "object_rgb.png"))

    _run_cli(rgb_b + ["--resume"])
    resumed = np.load(os.path.join(out_b, "green", "object.npy"))
    np.testing.assert_array_equal(resumed, golden)
    assert os.path.exists(os.path.join(out_b, "object_rgb.png"))
