"""Checkpoint/resume determinism: chunked runs equal straight-through runs."""

import numpy as np

from fpm_tpu.data.simulate import synthetic_dataset
from fpm_tpu.models.epry import reconstruct
from fpm_tpu.utils.checkpoint import (
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


def test_latest_checkpoint(tmp_path):
    assert latest_checkpoint(str(tmp_path)) is None
    for i in (2, 10, 4):
        save_checkpoint(str(tmp_path / f"ckpt_{i}.npz"), np.zeros((2, 2)), np.zeros((2, 2)), i)
    assert latest_checkpoint(str(tmp_path)).endswith("ckpt_10.npz")
