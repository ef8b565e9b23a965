"""Fused Pallas SPV kernels vs the scan reference path (interpret mode).

The fused kernels (ops/spv_pallas.py) re-derive the sliding-DFT forward
and the phase-accumulation inverse as single Mosaic programs; on CPU
they run under pallas interpret mode, so these tests pin the semantics
the TPU build must match: mag to f32 ulp scale, freq to <0.1 Hz on
every bin carrying meaningful energy, and inverse audio matching the
scan synthesis. Reference semantics: AudioSPV.cpp:13-145.
"""
import numpy as np
import pytest

from flan_tpu.ops.spv_pallas import (fused_forward_supported,
                                     spv_forward_fused, spv_inverse_fused)
from flan_tpu.spv.spv import _spv_forward_scan, _spv_inverse_scan

SR = 8000.0
NBINS = 128


def _signal(n=2000, ch=1):
    rng = np.random.default_rng(7)
    t = np.arange(n, dtype=np.float32) / SR
    x = (0.4 * np.sin(2 * np.pi * 440.0 * t)
         + 0.2 * np.sin(2 * np.pi * 1187.0 * t + 0.3)
         + 0.01 * rng.standard_normal(n).astype(np.float32))
    return np.broadcast_to(x, (ch, n)).astype(np.float32)


def test_supported_predicate():
    assert fused_forward_supported(128)
    assert fused_forward_supported(512)
    assert fused_forward_supported(1024)
    assert not fused_forward_supported(96)    # not lane-aligned
    assert not fused_forward_supported(2048)  # ring/VMEM bound


def test_forward_matches_scan():
    x = _signal()
    import jax.numpy as jnp
    xj = jnp.asarray(x)
    mag_f, freq_f = spv_forward_fused(xj, nbins=NBINS, sample_rate=SR)
    mag_s, freq_s = _spv_forward_scan(xj, nbins=NBINS, sample_rate=SR,
                                      chunk=256)
    mag_f, freq_f = np.asarray(mag_f), np.asarray(freq_f)
    mag_s, freq_s = np.asarray(mag_s), np.asarray(freq_s)
    assert mag_f.shape == mag_s.shape == (1, x.shape[1], NBINS)
    # mag: f32-ulp-scale agreement
    scale = np.abs(mag_s).max()
    assert np.abs(mag_f - mag_s).max() < 1e-5 * scale
    # freq: agreement on live bins (near-dead bins are phase noise by
    # construction in both forms)
    live = mag_s > 1e-3 * scale
    assert live.any()
    assert np.abs((freq_f - freq_s)[live]).max() < 0.1


def test_inverse_matches_scan():
    x = _signal()
    import jax.numpy as jnp
    xj = jnp.asarray(x)
    mag, freq = _spv_forward_scan(xj, nbins=NBINS, sample_rate=SR,
                                  chunk=256)
    y_f = np.asarray(spv_inverse_fused(mag, freq, sample_rate=SR))
    y_s = np.asarray(_spv_inverse_scan(mag, freq, sample_rate=SR))
    assert y_f.shape == y_s.shape
    # identical mod-1 accumulation semantics; tolerance covers the
    # triangular-matmul vs scan summation-order difference only
    scale = np.abs(y_s).max()
    assert np.abs(y_f - y_s).max() < 1e-4 * scale


def _aligned_snr(a, y, guard):
    xa, ya = a[guard:-guard], y[guard:-guard]
    # align by cross-correlation (synthesis group delay), then SNR
    n2 = 1 << 12
    xc = np.fft.irfft(np.fft.rfft(xa, n2).conj() * np.fft.rfft(ya, n2), n2)
    lag = int(np.argmax(xc))
    if lag > n2 // 2:
        lag -= n2
    if lag >= 0:
        xa2, ya2 = xa[: len(xa) - lag], ya[lag:lag + len(xa)]
    else:
        xa2, ya2 = xa[-lag:], ya[: len(xa) + lag]
    m = min(len(xa2), len(ya2))
    err = ((xa2[:m] - ya2[:m]) ** 2).mean()
    return 10 * np.log10((xa2[:m] ** 2).mean() / max(err, 1e-30))


def test_roundtrip_fused_end_to_end():
    x = _signal(n=2048)
    import jax.numpy as jnp
    xj = jnp.asarray(x)
    guard = 2 * NBINS  # sliding-window fill-in + group delay
    mag, freq = spv_forward_fused(xj, nbins=NBINS, sample_rate=SR)
    y_f = np.asarray(spv_inverse_fused(mag, freq, sample_rate=SR))[0]
    snr_f = _aligned_snr(x[0], y_f, guard)
    mag_s, freq_s = _spv_forward_scan(xj, nbins=NBINS, sample_rate=SR,
                                      chunk=256)
    y_s = np.asarray(_spv_inverse_scan(mag_s, freq_s, sample_rate=SR))[0]
    snr_s = _aligned_snr(x[0], y_s, guard)
    # the fused path must reach the scan path's own roundtrip quality
    # (absolute SNR is the representation's floor, not the kernel's)
    assert snr_f > snr_s - 1.0
    assert snr_f > 10.0


def test_multichannel_and_ragged_length():
    # padding tail + 2 channels exercises the grid/ring reset per channel
    x = _signal(n=1300, ch=2)
    x[1] *= -0.5
    import jax.numpy as jnp
    xj = jnp.asarray(np.ascontiguousarray(x))
    mag_f, freq_f = spv_forward_fused(xj, nbins=NBINS, sample_rate=SR)
    mag_s, freq_s = _spv_forward_scan(xj, nbins=NBINS, sample_rate=SR,
                                      chunk=256)
    scale = float(np.abs(np.asarray(mag_s)).max())
    assert np.abs(np.asarray(mag_f) - np.asarray(mag_s)).max() < 1e-5 * scale
