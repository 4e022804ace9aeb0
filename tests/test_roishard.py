"""ROI-axis data parallelism (parallel/roi_shard.py; SCALING.md).

The sharded large-FOV runner must reproduce the sequential tiling solver
exactly: same ROI grid, same per-ROI solver math, same stitch. Runs on the
8-fake-device CPU mesh (conftest).
"""

import dataclasses

import numpy as np
import pytest

from fpm_tpu.data.simulate import synthetic_dataset
from fpm_tpu.geometry import compute_geometry
from fpm_tpu.models.largefov import reconstruct_large_fov, roi_angle_error
from fpm_tpu.parallel.roi_shard import make_roi_mesh, reconstruct_large_fov_sharded


@pytest.fixture(scope="module")
def wide():
    return synthetic_dataset(np_size=48, grid=5, seed=7)


def test_roi_sharded_matches_sequential(wide):
    cfg = dataclasses.replace(wide.cfg, np_size=16, crop_x=0, crop_y=0)
    geom = compute_geometry(cfg, coordinates=wide.cfg.hole_coordinates)
    seq = reconstruct_large_fov(
        wide.images, geom, cfg, grid=(3, 3), overlap=4,
        iterations=4, dtype="complex128",
    )
    # 9 ROIs over 8 devices: exercises padding (one device gets two).
    shd = reconstruct_large_fov_sharded(
        wide.images, geom, cfg, grid=(3, 3), overlap=4,
        iterations=4, dtype="complex128", mesh=make_roi_mesh(),
    )
    assert len(shd.tiles) == 9
    ref = np.abs(seq.stitched).max()
    assert np.abs(shd.stitched - seq.stitched).max() / ref < 1e-10
    for a, b in zip(shd.tiles, seq.tiles):
        assert np.abs(a.obj_crop - b.obj_crop).max() / ref < 1e-10
        np.testing.assert_allclose(
            a.metrics["data_residual"], b.metrics["data_residual"], rtol=1e-9
        )


def test_roi_sharded_no_collectives(wide):
    """The whole point: zero per-sweep collectives in the compiled program."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fpm_tpu.geometry import pupil_support
    from fpm_tpu.models.epry import EPRYOptions, _sorted_device_inputs
    from fpm_tpu.parallel.comm import hlo_collective_inventory
    from fpm_tpu.parallel.roi_shard import _run_roi_sharded

    import jax.numpy as jnp

    cfg = dataclasses.replace(wide.cfg, np_size=16, crop_x=0, crop_y=0)
    geom = compute_geometry(cfg, coordinates=wide.cfg.hole_coordinates)
    opts = EPRYOptions.from_config(cfg, iterations=2, dtype="complex128")
    roi = wide.images[:, :16, :16]
    amps, starts = _sorted_device_inputs(roi, geom, jnp.complex128)
    mesh = make_roi_mesh()
    amps_stack = jax.device_put(
        jnp.stack([amps] * 8), NamedSharding(mesh, P("roi"))
    )
    valid = jax.device_put(jnp.ones(8, jnp.int32), NamedSharding(mesh, P("roi")))
    support_r = jnp.asarray(pupil_support(cfg, centered=False), jnp.float64)
    hlo = _run_roi_sharded.lower(
        amps_stack, valid, starts, support_r, opts, mesh
    ).compile().as_text()
    sweep_collectives = [
        e for e in hlo_collective_inventory(hlo) if "/shard_map/" in e["line"]
    ]
    assert sweep_collectives == [], sweep_collectives


def test_roi_angle_error_bound(wide):
    """The shared-geometry approximation is sub-pixel on the test grids."""
    cfg = dataclasses.replace(wide.cfg, np_size=16, crop_x=0, crop_y=0)
    geom = compute_geometry(cfg, coordinates=wide.cfg.hole_coordinates)
    err = roi_angle_error(cfg, geom, grid=(3, 3), overlap=4)
    assert err["max_idx_shift_px"] >= 0
    assert err["subpixel"], err
    # a much wider grid must report a larger (eventually super-pixel) error
    err_wide = roi_angle_error(cfg, geom, grid=(64, 64), overlap=4)
    assert err_wide["max_idx_shift_px"] > err["max_idx_shift_px"]
