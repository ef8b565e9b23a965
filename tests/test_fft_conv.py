"""Overlap-save MXU convolution (ops/fft_conv.py) vs direct convolution.

Replaces the whole-signal FFT pair of the reference's convolve
(reference AudioCombination.cpp:299-353) with blocked batched transforms.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from flan_tpu.ops.fft_conv import fft_convolve_full, _plan


@pytest.mark.parametrize("n,m", [(5000, 300), (300, 5000), (9000, 9000),
                                 (40961, 1234)])
def test_matches_numpy_convolve(n, m):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, n)).astype(np.float32)
    h = rng.standard_normal((2, m)).astype(np.float32)
    y = np.asarray(fft_convolve_full(jnp.asarray(x), jnp.asarray(h)))
    assert y.shape == (2, n + m - 1)
    ref = np.stack([np.convolve(x[c], h[c]) for c in range(2)])
    assert np.abs(y - ref).max() < 2e-5 * np.abs(ref).max()


def test_plan_blocks_long_signals():
    dft, step, nb = _plan(48000 * 30, 48000)
    assert dft <= (1 << 18) and nb > 1
    # blocking covers the full linear convolution
    assert nb * step >= 48000 * 30 + 48000 - 1


def test_too_long_ir_falls_back():
    assert _plan(10, 1 << 18) is None
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 500)).astype(np.float32)
    h = rng.standard_normal((1, 400)).astype(np.float32)
    y = np.asarray(fft_convolve_full(jnp.asarray(x), jnp.asarray(h)))
    ref = np.convolve(x[0], h[0])[None]
    assert np.abs(y - ref).max() < 2e-5 * np.abs(ref).max()
