"""2D FFT layer with an MXU (matmul-DFT) fast path.

The reference wraps ``cv::dft`` (cvComplex ``fft2``/``ifft2``; 315 calls =
11.6% of its runtime per ``output.svg``). On TPU there are two ways to run the
small per-LED 2D FFTs (Np is 90-200 in the bundled configs):

* ``xla`` — ``jnp.fft.fft2`` (XLA's FFT custom call).
* ``matmul`` — express the DFT as two complex matrix products
  ``F @ X @ F^T`` with a precomputed DFT matrix. This is O(N³) FLOPs vs
  O(N² log N) but runs on the 128×128 MXU systolic array at full throughput,
  while XLA's FFT is vector-unit/memory bound; for small N batched over many
  LEDs the MXU wins. Batched shapes (K, N, N) contract on the MXU as one big
  einsum.

The default picks ``matmul`` for N ≤ 256 on TPU and ``xla`` otherwise;
override globally with :func:`set_default_fft_impl` or per call with
``impl=``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_DEFAULT_IMPL: str | None = None  # None = size/backend heuristic
_MATMUL_MAX_N = 256


def set_default_fft_impl(impl: str | None) -> None:
    """Force the FFT implementation: 'xla', 'matmul', or None (heuristic)."""
    global _DEFAULT_IMPL
    if impl not in (None, "xla", "matmul"):
        raise ValueError(f"unknown fft impl {impl!r}")
    _DEFAULT_IMPL = impl


@functools.lru_cache(maxsize=32)
def _dft_matrix_np(n: int, inverse: bool, dtype: str) -> np.ndarray:
    k = np.arange(n)
    sign = 2j if inverse else -2j
    # Build in float64 for accuracy, then cast.
    mat = np.exp(sign * np.pi * np.outer(k, k) / n)
    if inverse:
        mat = mat / n
    return mat.astype(dtype)


def dft_matrix(n: int, inverse: bool = False, dtype=jnp.complex64) -> jax.Array:
    """The (inverse-normalized) DFT matrix, cached per (n, dtype)."""
    return jnp.asarray(_dft_matrix_np(n, inverse, np.dtype(dtype).name))


def _resolve_impl(n: int, impl: str | None) -> str:
    impl = impl or _DEFAULT_IMPL
    if impl is not None:
        return impl
    if n <= _MATMUL_MAX_N and jax.default_backend() == "tpu":
        return "matmul"
    return "xla"


def _matmul_fft2(x: jax.Array, inverse: bool) -> jax.Array:
    n, m = x.shape[-2], x.shape[-1]
    frow = dft_matrix(n, inverse, x.dtype)
    fcol = dft_matrix(m, inverse, x.dtype) if m != n else frow
    # rows then columns: (F_n @ X) @ F_m^T — symmetric matrices so no
    # transpose. HIGHEST precision: TPU f32 matmuls otherwise run as
    # single-pass bf16, far too coarse for an iterative solver's FFTs.
    y = jnp.einsum(
        "ij,...jk->...ik", frow, x,
        preferred_element_type=x.dtype, precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.einsum(
        "...ij,jk->...ik", y, fcol,
        preferred_element_type=x.dtype, precision=jax.lax.Precision.HIGHEST,
    )


def _ensure_complex(x: jax.Array) -> jax.Array:
    """Promote real input to the matching complex dtype.

    The matmul path would otherwise CAST the complex DFT matrix to the
    input's real dtype — silently discarding its imaginary part and
    computing a wrong transform (jnp.fft promotes real input, so the two
    impls must agree)."""
    if jnp.iscomplexobj(x):
        return x
    cdt = jnp.complex128 if x.dtype == jnp.float64 else jnp.complex64
    return x.astype(cdt)


def fft2(x: jax.Array, impl: str | None = None) -> jax.Array:
    """Unnormalized forward 2D FFT over the last two axes.

    Matches the reference's cvComplex ``fft2`` convention (unnormalized
    forward; the inverse carries the 1/N² scale via ``DFT_SCALE``,
    fpmMain.cpp:481).
    """
    x = _ensure_complex(x)
    if _resolve_impl(x.shape[-1], impl) == "matmul":
        return _matmul_fft2(x, inverse=False)
    return jnp.fft.fft2(x)


def ifft2(x: jax.Array, impl: str | None = None) -> jax.Array:
    """Normalized (1/N²) inverse 2D FFT over the last two axes."""
    x = _ensure_complex(x)
    if _resolve_impl(x.shape[-1], impl) == "matmul":
        return _matmul_fft2(x, inverse=True)
    return jnp.fft.ifft2(x)
