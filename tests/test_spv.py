"""Sliding-DFT phase vocoder tests (reference AudioSPV.cpp, SPV.cpp)."""
import numpy as np
import pytest

from flan_tpu import Audio, SPV, SQPV

SR = 8000.0


def sine(freq, seconds=0.25, amp=0.5):
    t = np.arange(int(seconds * SR), dtype=np.float32) / SR
    return Audio.create_from_array(
        (amp * np.sin(2 * np.pi * freq * t))[None], SR)


def test_spv_shapes():
    a = sine(440.0)
    spv = a.convert_to_SPV(128)
    assert spv.num_frames == a.num_frames
    assert spv.num_bins == 128
    assert spv.analysis_rate == SR


def test_spv_roundtrip():
    a = sine(440.0)
    b = a.convert_to_SPV(128).convert_to_audio()
    n = a.num_frames
    guard = 512  # sliding window fill-in
    x = np.asarray(a.data[0, guard:n - guard])
    y = np.asarray(b.data[0, guard:n - guard])
    rel = np.sqrt(((x - y) ** 2).mean()) / np.sqrt((x ** 2).mean())
    assert rel < 0.1


def test_spv_frequency_estimate():
    a = sine(440.0)
    spv = a.convert_to_SPV(128)
    mid = spv.num_frames // 2
    m = np.asarray(spv.mag[0, mid])
    f = np.asarray(spv.freq[0, mid])
    assert abs(f[m.argmax()] - 440.0) < 10.0


def test_spv_repitch():
    a = sine(440.0)
    spv = a.convert_to_SPV(128).repitch(1.5)
    b = spv.convert_to_audio()
    mid = np.asarray(b.data[0, 800:1800])
    spec = np.abs(np.fft.rfft(mid))
    peak = spec.argmax() * SR / len(mid)
    assert abs(peak - 660.0) < 20.0


def test_sqpv_buffer():
    s = SQPV.create(1, 100, 24.0, SR, (16.0, 4000.0))
    assert not s.is_null()
    # log-spaced bins: frequency doubles every bins_per_octave bins
    assert s.bin_to_frequency(24) == pytest.approx(
        2 * s.bin_to_frequency(0), rel=1e-6)
    assert s.frequency_to_bin(s.bin_to_frequency(10)) == pytest.approx(
        10.0, abs=1e-6)
    assert s.q == pytest.approx(1.0 / (2 ** (1 / 24) - 1.0))


def test_sqpv_conversion_activated():
    # dormant upstream (AudioSQPV.cpp commented out) but activated here;
    # full coverage lives in tests/test_sqpv_transform.py
    a = sine(440.0)
    sq = a.convert_to_SQPV((55.0, 1760.0), 4)
    assert not sq.is_null()


def test_spv_roundtrip_bench_scale_aligned():
    """Round trip at the bench config's rate/bins (48 kHz, 512 bins).

    The sliding-window reconstruction carries a small constant lead
    (~34 samples at this config - group delay of the synthesis
    convention), so fidelity is asserted after cross-correlation
    alignment; unaligned sample-wise SNR is meaningless here (measured
    -4.5 dB for a perfectly reconstructed sine, round 3)."""
    from flan_tpu.spv.spv import spv_forward, spv_inverse
    import jax.numpy as jnp
    sr = 48000.0
    n = int(0.25 * sr)
    t = np.arange(n, dtype=np.float32) / sr
    x = jnp.asarray((0.4 * np.sin(2 * np.pi * 440.0 * t))[None])
    mag, freq = spv_forward(x, 512, sr)
    y = spv_inverse(mag, freq, sr)
    a = np.asarray(x)[0][2048:-2048]
    b = np.asarray(y)[0][2048:-2048]
    n2 = 1 << 14
    xc = np.fft.irfft(np.fft.rfft(a, n2).conj() * np.fft.rfft(b, n2), n2)
    lag = int(np.argmax(xc))
    if lag > n2 // 2:
        lag -= n2
    assert abs(lag) < 128, lag
    b_al = np.asarray(y)[0][2048 + lag:2048 + lag + len(a)]
    err = ((a - b_al) ** 2).mean()
    snr = 10 * np.log10((a ** 2).mean() / max(err, 1e-30))
    assert snr > 25.0, snr
