"""TPU-native complex-math kernel layer.

The functional replacement for the reference's external ``cvComplex`` C++
library (SURVEY.md C7: fft2/ifft2/fftShift/complexMultiply/Divide/Abs/Conj on
2-channel CV_64FC2 mats, linked at makefile:23, call sites fpmMain.cpp:310-497).
Here complex fields are native ``complex64/128`` JAX arrays; element-wise
chains are fused by XLA or by the Pallas kernels in
:mod:`fpm_tpu.ops.pallas_kernels`, and small batched 2D FFTs can run on the
MXU as DFT matmuls (:mod:`fpm_tpu.ops.fft`).
"""

from .complexops import (  # noqa: F401
    fftshift2d,
    ifftshift2d,
    crop_patch,
    paste_patch_add,
)
from .fft import fft2, ifft2, set_default_fft_impl, dft_matrix  # noqa: F401
