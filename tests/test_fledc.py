"""BASELINE config #4: dataset_fLED-c.json + ledArrayMaps/fLED-c.json e2e.

The reference cannot run this pair at all: the config's coordinate-file key
is misspelled AND points at a file that was never shipped
(``holeCoordinatFile: "fLED-full.json"``, /root/reference/dataset_fLED-c.json:28),
and the code would have discarded it anyway (quirk 4, fpmMain.cpp:577-582).
Here the pair runs end-to-end: the alias key parses, the missing file falls
back to the ``ledArrayMap`` hardware map (the reader the reference lacked,
SURVEY.md C9), and a reconstruction on the fLED board geometry converges.
"""

import dataclasses
import os

import numpy as np
import pytest

from fpm_tpu.config import load_config
from fpm_tpu.data.simulate import make_test_object, simulate_images
from fpm_tpu.geometry import compute_geometry
from fpm_tpu.models.epry import reconstruct

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "dataset_fLED-c.json")),
    reason="reference mount not available",
)


@pytest.fixture(scope="module")
def fledc_cfg():
    cfg = load_config(os.path.join(REF, "dataset_fLED-c.json"))
    # The pair: point the fpm-tpu ledArrayMap key at the shipped hardware map
    # (relative paths resolve against the config's own directory).
    return dataclasses.replace(cfg, led_array_map="ledArrayMaps/fLED-c.json")


def test_fledc_coordinates_from_map(fledc_cfg):
    with pytest.warns(UserWarning, match="fLED-full.json"):
        coords = fledc_cfg.coordinates()
    assert coords.shape == (581, 3)  # the fLED board map lists 581 LEDs
    assert np.isfinite(coords).all()
    geom = compute_geometry(fledc_cfg, coordinates=coords)
    # maxIlluminationNA 0.4 keeps the central 89 LEDs of the board
    assert geom.num_leds == 89
    assert geom.is_darkfield.any()  # objectiveNA 0.1 -> darkfield LEDs exist


def test_fledc_missing_file_without_fallback_raises():
    cfg = load_config(os.path.join(REF, "dataset_fLED-c.json"))
    with pytest.raises(FileNotFoundError, match="fLED-full.json"):
        cfg.coordinates()


def test_fledc_reconstruction_converges(fledc_cfg):
    # Shrink the patch for CPU test speed — geometry (crop offsets, NA
    # filter) scales consistently with Np since idx_uv ∝ Np.
    cfg = dataclasses.replace(fledc_cfg, np_size=64)
    with pytest.warns(UserWarning):
        coords = cfg.coordinates()
    geom = compute_geometry(cfg, coordinates=coords)
    obj_true = make_test_object(cfg.n_large, seed=4)
    images = simulate_images(obj_true, geom, cfg, quantize=True)
    res = reconstruct(images, geom, cfg, iterations=10, dtype="complex64",
                      collect_metrics=False)
    a, t = np.abs(res.obj_crop), np.abs(obj_true)
    s = (t * a).sum() / (a * a).sum()
    rmse = np.sqrt(((a * s - t) ** 2).mean()) / t.mean()
    assert rmse < 0.08
