"""Device-mesh construction for FPM sharding axes.

Axes:
* ``led``  — LED-batch data parallelism (the DP analogue, SURVEY.md N1).
* ``tile`` — spectrum-row tiling of the large Fourier object (the SP/CP
  analogue, SURVEY.md N2).

On a pod slice the mesh is laid out so ``tile`` neighbors (which exchange
halos every sweep) ride ICI links, while ``led`` only needs all-reduce.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_shape_for(n_devices: int, n_large: int, np_size: int) -> tuple[int, int]:
    """Pick an (led, tile) factorization of ``n_devices``.

    The tile axis is capped so each row shard keeps at least ``np_size`` rows
    (patches then straddle at most two shards — single-hop halos); remaining
    devices go to the LED axis.
    """
    max_tile = max(1, n_large // np_size)
    tile = 1
    for cand in range(min(n_devices, max_tile), 0, -1):
        if n_devices % cand == 0:
            tile = cand
            break
    return n_devices // tile, tile


def make_mesh(
    led: int | None = None, tile: int = 1, devices=None
) -> Mesh:
    """Build a 2-D ('led', 'tile') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if led is None:
        led = n // tile
    if led < 1 or tile < 1:
        # Covers tile > n with led=None (n // tile == 0 → an EMPTY mesh and
        # a confusing downstream failure) and explicit zero/negative axes.
        raise ValueError(
            f"mesh axes must be >= 1, got led={led} tile={tile} "
            f"({n} devices available)"
        )
    if led * tile > n:
        raise ValueError(
            f"mesh led={led} x tile={tile} needs {led * tile} devices; "
            f"only {n} available"
        )
    if led * tile != n:
        devices = devices[: led * tile]
    arr = np.asarray(devices).reshape(led, tile)
    return Mesh(arr, axis_names=("led", "tile"))
