"""Deterministic checkpoint/resume for the iterative solve.

The reference has no checkpointing at all — a killed run loses everything and
results only ever existed in GUI windows (SURVEY.md §5, fpmMain.cpp:495-497).
The solver state is tiny and RNG-free: ``(obj_f_centered, pupil, iteration)``
fully determines the rest of the run, so restart is bit-deterministic.
"""

from __future__ import annotations

import os

import numpy as np


def save_checkpoint(path: str, obj_f_centered, pupil, iteration: int, meta: dict | None = None):
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(
            f,
            obj_f_centered=np.asarray(obj_f_centered),
            pupil=np.asarray(pupil),
            iteration=np.int64(iteration),
        )
    os.replace(tmp, path)


def load_checkpoint(path: str):
    with np.load(path) as z:
        return z["obj_f_centered"], z["pupil"], int(z["iteration"])


def latest_checkpoint(directory: str, prefix: str = "ckpt_") -> str | None:
    if not os.path.isdir(directory):
        return None
    cands = [
        f for f in os.listdir(directory) if f.startswith(prefix) and f.endswith(".npz")
    ]
    if not cands:
        return None
    cands.sort(key=lambda f: int(f[len(prefix) : -4]))
    return os.path.join(directory, cands[-1])
