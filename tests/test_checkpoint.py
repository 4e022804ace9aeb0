"""Checkpoint/resume determinism: chunked runs equal straight-through runs."""

import numpy as np
import pytest

from fpm_tpu.data.simulate import synthetic_dataset
from fpm_tpu.models.epry import reconstruct
from fpm_tpu.utils.checkpoint import (
    CheckpointMismatch,
    fingerprint,
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)


def test_resume_is_bit_deterministic(tmp_path):
    ds = synthetic_dataset(np_size=16, grid=5, seed=4)
    full = reconstruct(ds.images, ds.geom, ds.cfg, iterations=6, dtype="complex128")

    first = reconstruct(ds.images, ds.geom, ds.cfg, iterations=3, dtype="complex128")
    ck = str(tmp_path / "ckpt_3.npz")
    save_checkpoint(ck, first.obj_f_centered, first.pupil, 3)
    obj_f, pupil, it = load_checkpoint(ck)
    assert it == 3
    resumed = reconstruct(
        ds.images, ds.geom, ds.cfg, iterations=3, dtype="complex128",
        initial_state=(obj_f, pupil),
    )
    # State round-trips losslessly through npz → identical trajectories.
    np.testing.assert_array_equal(resumed.obj_f_centered, full.obj_f_centered)
    np.testing.assert_array_equal(resumed.pupil, full.pupil)


def test_fingerprint_guards_resume(tmp_path, capsys):
    """Resuming under different solver options must refuse, not diverge."""
    ds = synthetic_dataset(np_size=16, grid=5, seed=4)
    fp = fingerprint(ds.cfg, ds.geom, mode="sequential", chunk_size=32,
                     global_max="eager", dft_precision="highest")
    ck = str(tmp_path / "ckpt_2.npz")
    save_checkpoint(ck, np.zeros((2, 2)), np.zeros((2, 2)), 2, meta=fp)

    # Same fingerprint: loads.
    _, _, it = load_checkpoint(ck, expect=fp)
    assert it == 2

    # Changed solver option: strict load refuses and names the key.
    bad = dict(fp, mode="batched", chunk_size=16)
    with pytest.raises(CheckpointMismatch, match="mode"):
        load_checkpoint(ck, expect=bad)
    # Non-strict downgrades to a warning.
    load_checkpoint(ck, expect=bad, strict=False)
    assert "WARNING" in capsys.readouterr().out

    # Changed LED schedule (different problem): different fingerprint.
    ds2 = synthetic_dataset(np_size=16, grid=3, seed=4)
    fp2 = fingerprint(ds2.cfg, ds2.geom, mode="sequential", chunk_size=32,
                      global_max="eager", dft_precision="highest")
    assert fp2["schedule_sha"] != fp["schedule_sha"]

    # Pre-provenance checkpoint (no fingerprint payload): refused when
    # an expectation is supplied.
    old = str(tmp_path / "ckpt_1.npz")
    with open(old, "wb") as f:
        np.savez(f, obj_f_centered=np.zeros((2, 2)), pupil=np.zeros((2, 2)),
                 iteration=np.int64(1))
    with pytest.raises(CheckpointMismatch, match="pre-provenance"):
        load_checkpoint(old, expect=fp)
    # ...but inspection without an expectation still works.
    _, _, it = load_checkpoint(old)
    assert it == 1


def test_latest_checkpoint(tmp_path):
    assert latest_checkpoint(str(tmp_path)) is None
    for i in (2, 10, 4):
        save_checkpoint(str(tmp_path / f"ckpt_{i}.npz"), np.zeros((2, 2)), np.zeros((2, 2)), i)
    assert latest_checkpoint(str(tmp_path)).endswith("ckpt_10.npz")
