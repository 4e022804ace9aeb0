"""fpm-tpu: a TPU-native Fourier Ptychographic Microscopy reconstruction engine.

Brand-new JAX/XLA/Pallas/pjit implementation of the capabilities of the
C++/OpenCV reference ``Xiongda337/fpm-OpenCV`` (see SURVEY.md for the full
structural map). Public entry points:

* :func:`fpm_tpu.load_config` — parse the reference's ``dataset_*.json``.
* :func:`fpm_tpu.compute_geometry` — vectorized LED illumination geometry.
* :func:`fpm_tpu.load_dataset` — image-stack ingestion.
* :func:`fpm_tpu.reconstruct` — the jitted EPRY reconstruction.
* ``python -m fpm_tpu run dataset.json -n ITERS`` — the CLI
  (mirrors ``./fpmMain dataset.json iterations``, fpmMain.cpp:501-506).
"""

from .config import FPMConfig, load_config, default_dome_coordinates  # noqa: F401
from .geometry import LEDGeometry, compute_geometry, pupil_support  # noqa: F401
from .models import (  # noqa: F401
    EPRYOptions,
    ReconResult,
    reconstruct,
    reconstruct_channels,
)

__version__ = "0.1.0"
