"""MXU matmul FFT and phase-accumulator numerics."""
import numpy as np
import pytest

import jax.numpy as jnp

from flan_tpu.ops.mxu_fft import irfft_mxu, rfft_mxu
from flan_tpu.ops.stft import cumsum_mod1_frames


@pytest.mark.parametrize("n", [64, 256, 1024, 2048, 4096])
def test_rfft_matches_numpy(n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, n)).astype(np.float32)
    re, im = rfft_mxu(jnp.asarray(x), n)
    ref = np.fft.rfft(x, n=n, axis=-1)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(re), ref.real,
                               atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(im), ref.imag,
                               atol=2e-5 * scale)


@pytest.mark.parametrize("n", [256, 4096])
def test_irfft_matches_numpy(n):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, n)).astype(np.float32)
    spec = np.fft.rfft(x, axis=-1)
    y = irfft_mxu(jnp.asarray(spec.real.astype(np.float32)),
                  jnp.asarray(spec.imag.astype(np.float32)), n)
    np.testing.assert_allclose(np.asarray(y), x, atol=2e-5)


def test_rfft_pads_short_input():
    x = jnp.ones((1, 100), jnp.float32)
    re, im = rfft_mxu(x, 256)
    ref = np.fft.rfft(np.ones((1, 100)), n=256, axis=-1)
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=1e-4)


def test_cumsum_mod1():
    rng = np.random.default_rng(2)
    x = rng.random((2, 1000, 5)).astype(np.float32)
    y = np.asarray(cumsum_mod1_frames(jnp.asarray(x)))
    ref = np.mod(np.cumsum(x.astype(np.float64), axis=1), 1.0)
    d = np.abs(y - ref)
    d = np.minimum(d, 1.0 - d)  # circular distance
    assert d.max() < 5e-4
    assert (y >= 0).all() and (y < 1).all()


def test_irfft_truncated_output_matches_full():
    """out_len skips dead stage-2 columns but must agree with the full
    transform on the kept prefix (OLA synthesis keeps window of dft)."""
    rng = np.random.default_rng(3)
    n = 4096
    x = rng.standard_normal((2, n)).astype(np.float32)
    spec = np.fft.rfft(x, axis=-1)
    re = jnp.asarray(spec.real.astype(np.float32))
    im = jnp.asarray(spec.imag.astype(np.float32))
    full = np.asarray(irfft_mxu(re, im, n))
    for out_len in (2048, 2176, 100):
        part = np.asarray(irfft_mxu(re, im, n, out_len=out_len))
        assert part.shape[-1] >= out_len
        np.testing.assert_allclose(part[..., :out_len],
                                   full[..., :out_len], atol=2e-5)


def test_rfft_zero_tail_trim_matches_padded():
    """A short input (half-zero dft frame) must match numpy's padded rfft
    through the trimmed stage-1 path."""
    rng = np.random.default_rng(4)
    for m, n in ((2048, 4096), (512, 1024), (300, 1024)):
        x = rng.standard_normal((3, m)).astype(np.float32)
        re, im = rfft_mxu(jnp.asarray(x), n)
        ref = np.fft.rfft(x, n=n, axis=-1)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(np.asarray(re), ref.real,
                                   atol=2e-5 * scale)
        np.testing.assert_allclose(np.asarray(im), ref.imag,
                                   atol=2e-5 * scale)


@pytest.mark.parametrize("n", [5, 9, 10, 14, 22, 100])
def test_fft_awkward_sizes(n):
    """Sizes whose half is odd (or odd n) fall back to exact dense-DFT
    splits instead of crashing (round-2 review finding 1)."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, n)).astype(np.float32)
    re, im = rfft_mxu(jnp.asarray(x), n)
    ref = np.fft.rfft(x, axis=-1)
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=2e-4)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=2e-4)
    y = np.asarray(irfft_mxu(jnp.asarray(ref.real.astype(np.float32)),
                             jnp.asarray(ref.imag.astype(np.float32)), n))
    np.testing.assert_allclose(y[..., :n], x, atol=2e-4)
