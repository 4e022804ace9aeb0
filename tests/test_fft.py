"""FFT layer: the MXU matmul-DFT path must match XLA's FFT."""

import jax.numpy as jnp
import numpy as np
import pytest

from fpm_tpu.ops.fft import dft_matrix, fft2, ifft2


@pytest.mark.parametrize("n", [16, 90, 128])
@pytest.mark.parametrize("dtype", [jnp.complex64, jnp.complex128])
def test_matmul_fft_matches_xla(n, dtype):
    rng = np.random.default_rng(n)
    x = jnp.asarray(
        rng.standard_normal((3, n, n)) + 1j * rng.standard_normal((3, n, n)), dtype
    )
    tol = 1e-3 if dtype == jnp.complex64 else 1e-10
    ref = np.fft.fft2(np.asarray(x))
    got = np.asarray(fft2(x, impl="matmul"))
    assert np.abs(got - ref).max() / np.abs(ref).max() < tol
    ref_i = np.fft.ifft2(np.asarray(x))
    got_i = np.asarray(ifft2(x, impl="matmul"))
    assert np.abs(got_i - ref_i).max() / (np.abs(ref_i).max() + 1e-30) < tol


def test_roundtrip():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((90, 90)) + 0j, jnp.complex128)
    y = ifft2(fft2(x, impl="matmul"), impl="matmul")
    assert np.abs(np.asarray(y) - np.asarray(x)).max() < 1e-10


def test_dft_matrix_unitary_scaled():
    f = np.asarray(dft_matrix(32, dtype=jnp.complex128))
    finv = np.asarray(dft_matrix(32, inverse=True, dtype=jnp.complex128))
    np.testing.assert_allclose(f @ finv, np.eye(32), atol=1e-10)
