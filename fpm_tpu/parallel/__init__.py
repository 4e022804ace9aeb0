"""Distributed execution: device meshes, LED-batch and spectrum-tile sharding.

All-new TPU-native subsystems with no reference counterpart (the reference is
strictly single-process and sequential — SURVEY.md §2 "Parallelism
disclosure"): LED-batch data parallelism (N1), spectrum-tile spatial
parallelism with halo exchange (N2), and the JAX collective communication
backend over ICI/DCN (N3: psum for pupil consensus, pmax for the global
``max|O|`` reduction the reference does with ``cv::minMaxLoc`` at
fpmMain.cpp:467, ppermute halos).
"""

from .mesh import make_mesh, mesh_shape_for  # noqa: F401
from .led_shard import prepare_led_sharded, reconstruct_led_sharded  # noqa: F401
from .tile_shard import prepare_tile_sharded, reconstruct_tile_sharded  # noqa: F401
from .roi_shard import make_roi_mesh, reconstruct_large_fov_sharded  # noqa: F401
from .comm import (  # noqa: F401
    hlo_collective_inventory,
    led_shard_comm,
    project_weak_scaling,
    tile_shard_comm,
)
