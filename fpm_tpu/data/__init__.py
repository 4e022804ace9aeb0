"""Data/ingestion layer: dataset loading, LED geometry data, forward simulation.

TPU-native replacement for the reference's L1 ingestion layer
(``loadFPMDataset``, fpmMain.cpp:36-271): directory scan + decode happen
host-side (optionally through the native C++ loader in
:mod:`fpm_tpu.native`), everything downstream is packed into dense arrays and
shipped to the device once — the reference instead round-trips host↔device
per LED inside its hot loop (fpmMain.cpp:380-381).
"""

from .loader import load_dataset, load_dataset_rgb, LoadedDataset  # noqa: F401
from .simulate import simulate_images, synthetic_dataset, make_test_object  # noqa: F401
