"""Donation/aliasing safety (SURVEY.md §5 'race detection' row).

jit purity makes data races structural in this framework; what can still go
wrong is buffer donation/aliasing — a donated input silently reused, or a
solver call mutating caller-visible arrays. These tests pin that down.
"""

import numpy as np

from fpm_tpu.data.simulate import synthetic_dataset
from fpm_tpu.models.epry import reconstruct


def test_inputs_not_mutated():
    ds = synthetic_dataset(np_size=16, grid=5, seed=13)
    images = ds.images.copy()
    reconstruct(images, ds.geom, ds.cfg, iterations=2, dtype="complex128")
    np.testing.assert_array_equal(images, ds.images)
    # geometry tables untouched
    assert ds.geom.crop_start.flags.writeable  # still the caller's array


def test_repeat_calls_identical():
    """Same inputs → bit-identical results (no hidden state, no donation
    hazard across calls)."""
    ds = synthetic_dataset(np_size=16, grid=5, seed=13)
    a = reconstruct(ds.images, ds.geom, ds.cfg, iterations=3, dtype="complex128")
    b = reconstruct(ds.images, ds.geom, ds.cfg, iterations=3, dtype="complex128")
    np.testing.assert_array_equal(a.obj_f_centered, b.obj_f_centered)
    np.testing.assert_array_equal(a.pupil, b.pupil)


def test_initial_state_arrays_reusable():
    """The resume path must not consume (donate) the caller's state arrays."""
    ds = synthetic_dataset(np_size=16, grid=5, seed=13)
    first = reconstruct(ds.images, ds.geom, ds.cfg, iterations=2, dtype="complex128")
    state = (first.obj_f_centered.copy(), first.pupil.copy())
    reconstruct(ds.images, ds.geom, ds.cfg, iterations=2, dtype="complex128",
                initial_state=state)
    np.testing.assert_array_equal(state[0], first.obj_f_centered)
    np.testing.assert_array_equal(state[1], first.pupil)
