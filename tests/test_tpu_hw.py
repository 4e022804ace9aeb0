"""Compiled-on-TPU regression tests (PARITY.md N4's hardware evidence).

Every other test module runs the Pallas kernels in interpret mode on the
fake-device CPU backend (conftest pins it); these execute the *compiled*
kernels on the real chip, so the bf16x3/highest parity claims are a
committed regression suite rather than anecdote.

Run:  FPM_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_hw.py -q
(The driver's CPU test sweep auto-skips this module.)

First run compiles ~7 programs (minutes on this rig's remote-compile
tunnel); the persistent cache (.jax_cache) makes later runs fast.
"""

import jax
import numpy as np
import pytest

if jax.default_backend() != "tpu":
    pytest.skip(
        "needs the real TPU backend — run with FPM_TEST_PLATFORM=tpu",
        allow_module_level=True,
    )

from fpm_tpu.config import FPMConfig
from fpm_tpu.data.simulate import make_test_object, simulate_images
from fpm_tpu.geometry import compute_geometry
from fpm_tpu.models.epry import reconstruct


def _problem(**cfg_kwargs):
    cfg = FPMConfig(iterations=2, **cfg_kwargs)
    geom = compute_geometry(cfg)
    obj = make_test_object(cfg.n_large, seed=0)
    images = simulate_images(obj, geom, cfg, quantize=True)
    return cfg, geom, images


def _rel(a, b):
    return np.abs(a - b).max() / np.abs(b).max()


@pytest.fixture(scope="module")
def mono():
    # The bench.py headline problem: mono optics, dome LEDs, K=193, Np=90.
    return _problem(max_illumination_na=0.45)


@pytest.fixture(scope="module")
def mono_xla(mono):
    cfg, geom, images = mono
    return reconstruct(images, geom, cfg, iterations=2)


# Tolerance rationale: both sides are f32 trajectories compiled by two
# different compilers (XLA HIGHEST-precision matmul-DFT vs the fused Pallas
# kernel), and the EPRY iteration is nonlinear (|P|² divisions, running
# max|O| normalization), so per-op f32 rounding (~1.2e-7) compounds across
# 193 sequential LED updates per sweep. The single-sweep bound below pins
# kernel-level agreement tightly; the 2-sweep bounds are the measured
# trajectory-divergence floor (~5e-7 highest / ~4e-6 bf16x3) with ~3x margin.


def test_single_sweep_pallas_highest_is_tight(mono):
    """One sweep, exact-f32 DFTs: kernel-level agreement, minimal compounding."""
    cfg, geom, images = mono
    xla = reconstruct(images, geom, cfg, iterations=1)
    pal = reconstruct(images, geom, cfg, iterations=1,
                      use_pallas=True, dft_precision="highest")
    assert _rel(pal.obj_f_centered, xla.obj_f_centered) < 5e-7
    assert _rel(pal.pupil, xla.pupil) < 5e-7


def test_sequential_pallas_bf16x3(mono, mono_xla):
    cfg, geom, images = mono
    res = reconstruct(images, geom, cfg, iterations=2,
                      use_pallas=True, dft_precision="bf16x3")
    assert _rel(res.obj_f_centered, mono_xla.obj_f_centered) < 1e-5
    assert _rel(res.pupil, mono_xla.pupil) < 1e-5


def test_sequential_pallas_highest(mono, mono_xla):
    cfg, geom, images = mono
    res = reconstruct(images, geom, cfg, iterations=2,
                      use_pallas=True, dft_precision="highest")
    assert _rel(res.obj_f_centered, mono_xla.obj_f_centered) < 2e-6
    assert _rel(res.pupil, mono_xla.pupil) < 2e-6


def test_batched_chunk_pallas(mono):
    """The headline shardable mode: fused chunk kernel vs XLA chunk math."""
    cfg, geom, images = mono
    xla = reconstruct(images, geom, cfg, iterations=2,
                      mode="batched", chunk_size=32)
    pal = reconstruct(images, geom, cfg, iterations=2,
                      mode="batched", chunk_size=32,
                      use_pallas=True, collect_metrics=False)
    assert _rel(pal.obj_f_centered, xla.obj_f_centered) < 1e-5
    assert _rel(pal.pupil, xla.pupil) < 1e-5


def test_lazy_global_max(mono):
    cfg, geom, images = mono
    xla = reconstruct(images, geom, cfg, iterations=2, global_max="lazy")
    pal = reconstruct(images, geom, cfg, iterations=2, global_max="lazy",
                      use_pallas=True)
    assert _rel(pal.obj_f_centered, xla.obj_f_centered) < 1e-5


@pytest.fixture(scope="module")
def dogstomach():
    # Np=200 (dataset_dogStomach.json scale) — the PARITY.md N4 shape.
    return _problem(
        np_size=200, pixel_size=6.5, objective_mag=8.0, objective_na=0.2,
        max_illumination_na=0.30, wavelength=0.63,
    )


def test_dogstomach_shape(dogstomach):
    cfg, geom, images = dogstomach
    xla = reconstruct(images, geom, cfg, iterations=1)
    pal = reconstruct(images, geom, cfg, iterations=1,
                      use_pallas=True, dft_precision="bf16x3")
    assert _rel(pal.obj_f_centered, xla.obj_f_centered) < 1e-5
    assert _rel(pal.pupil, xla.pupil) < 1e-5


def test_dogstomach_chunked(dogstomach):
    """The headline chunked mode at Np=200 (VERDICT r3 item 2): a chunk32
    request is auto-clamped to the compile ceiling (chunk 16 at Np=200 —
    chunk 20+ fails remote compilation, measured round 4) and must match
    the XLA chunked math at the same effective chunking."""
    from fpm_tpu.models.epry import effective_chunk_size

    cfg, geom, images = dogstomach
    k = int(geom.num_leds)
    eff = effective_chunk_size(cfg.np_size, 32, k, True, "batched")
    assert eff == 16
    xla = reconstruct(images, geom, cfg, iterations=1,
                      mode="batched", chunk_size=eff)
    pal = reconstruct(images, geom, cfg, iterations=1,
                      mode="batched", chunk_size=32,   # auto-clamped to 16
                      use_pallas=True, collect_metrics=False)
    assert _rel(pal.obj_f_centered, xla.obj_f_centered) < 1e-5
    assert _rel(pal.pupil, xla.pupil) < 1e-5
