"""Golden-math parity: the jitted TPU solver vs the reference-faithful oracle.

SURVEY.md §4.1: step-by-step float64 NumPy oracle implementing §2.2 on tiny
synthetic sizes; the JAX solver (centered-frame redesign, scan/fori control
flow, donated buffers) must reproduce it to numerical precision.
"""

import numpy as np
import pytest

from fpm_tpu.data.simulate import synthetic_dataset
from fpm_tpu.models.epry import reconstruct
from fpm_tpu.oracle import run_fpm_oracle


@pytest.fixture(scope="module")
def ds():
    return synthetic_dataset(np_size=16, grid=5, seed=1)


def test_sequential_matches_oracle_exactly(ds):
    res_o = run_fpm_oracle(ds.images, ds.geom, ds.cfg, iterations=3)
    res_j = reconstruct(ds.images, ds.geom, ds.cfg, iterations=3, dtype="complex128")
    scale = np.abs(res_o.obj_f).max()
    assert np.abs(res_j.obj_f - res_o.obj_f).max() / scale < 1e-12
    assert np.abs(res_j.pupil - res_o.pupil).max() < 1e-12
    assert (
        np.abs(res_j.obj_crop - res_o.obj_crop).max() / np.abs(res_o.obj_crop).max()
        < 1e-12
    )


def test_complex64_close_to_oracle(ds):
    """The TPU dtype (c64) stays within single-precision of the c128 oracle."""
    res_o = run_fpm_oracle(ds.images, ds.geom, ds.cfg, iterations=3)
    res_j = reconstruct(ds.images, ds.geom, ds.cfg, iterations=3, dtype="complex64")
    rel = np.abs(res_j.obj_f - res_o.obj_f).max() / np.abs(res_o.obj_f).max()
    assert rel < 1e-3


def test_lazy_global_max_close(ds):
    """'lazy' per-sweep max|O| refresh is a documented approximation; its
    deviation from the exact per-LED reduction must stay small."""
    exact = reconstruct(ds.images, ds.geom, ds.cfg, iterations=5, dtype="complex128")
    lazy = reconstruct(
        ds.images, ds.geom, ds.cfg, iterations=5, dtype="complex128",
        global_max="lazy",
    )
    rel = np.abs(lazy.obj_crop - exact.obj_crop).max() / np.abs(exact.obj_crop).max()
    assert rel < 0.05


def test_seed_is_second_lowest_na(ds):
    """Init contract: object seeded from sortedIndicies.at(1) (quirk 2)."""
    # Zero out the second-lowest-NA image; the t=0 spectrum must be zero.
    images = ds.images.copy()
    seed_pos = ds.geom.schedule[1]
    images[seed_pos] = 0
    res = run_fpm_oracle(images, ds.geom, ds.cfg, iterations=0)
    assert np.abs(res.obj_f).max() == 0.0


def test_metrics_monotone_convergence(ds):
    res = reconstruct(ds.images, ds.geom, ds.cfg, iterations=8, dtype="complex128")
    resid = res.metrics["data_residual"]
    assert resid.shape == (8,)
    # Residual after convergence must be far below the first sweep.
    assert resid[-1] < 0.2 * resid[0]


def test_batched_channels_bitwise_match_separate_solves():
    """reconstruct_channels (the --color-mode rgb solve) runs N independent
    same-geometry problems as one compiled program; every channel's result
    must be BITWISE identical to its own single-problem reconstruct() call,
    on the vmapped XLA path and the lax.map Pallas path alike."""
    from fpm_tpu.models.epry import reconstruct_channels

    ds = synthetic_dataset(np_size=16, grid=5, quantize=True)
    chans = [ds.images, ds.images * 0.8 + 1.0, ds.images * 1.2]
    for kwargs in (
        dict(),                                           # sequential, vmap
        dict(mode="batched", chunk_size=8),               # chunked XLA, vmap
        dict(mode="batched", chunk_size=8, use_pallas=True),  # pallas, lax.map
    ):
        sep = [reconstruct(c, ds.geom, ds.cfg, iterations=3,
                           dtype="complex128", **kwargs) for c in chans]
        bat = reconstruct_channels(chans, ds.geom, ds.cfg, iterations=3,
                                   dtype="complex128", **kwargs)
        for a, b in zip(sep, bat):
            np.testing.assert_array_equal(a.obj_crop, b.obj_crop)
            np.testing.assert_array_equal(a.pupil, b.pupil)
            np.testing.assert_array_equal(
                a.metrics["data_residual"], b.metrics["data_residual"])
