"""Combination tests: mix, join, select, convolve
(reference AudioCombination.cpp)."""
import numpy as np
import pytest

from flan_tpu import Audio

SR = 8000.0


def const_audio(value, n=100, channels=1):
    return Audio.create_from_array(
        np.full((channels, n), value, np.float32), SR)


def test_mix_sums():
    a = const_audio(0.25)
    b = const_audio(0.5)
    m = Audio.mix([a, b])
    np.testing.assert_allclose(np.asarray(m.data), 0.75, atol=1e-6)


def test_mix_with_start_times():
    a = const_audio(1.0, n=100)
    m = Audio.mix([a, a], start_times=[0.0, 50 / SR])
    assert m.num_frames == 150
    d = np.asarray(m.data[0])
    assert d[25] == 1.0
    assert d[75] == 2.0
    assert d[125] == 1.0


def test_mix_gain_functions():
    a = const_audio(1.0, n=100)
    m = Audio.mix([a], gains=[lambda t: t * SR / 100.0])
    d = np.asarray(m.data[0])
    np.testing.assert_allclose(d, np.arange(100) / 100.0, atol=1e-5)


def test_mix_channel_broadcast():
    mono = const_audio(1.0, channels=1)
    stereo = const_audio(0.5, channels=2)
    m = Audio.mix([mono, stereo])
    assert m.num_channels == 2
    d = np.asarray(m.data)
    assert d[0, 0] == 1.5   # mono adds into channel 0 only
    assert d[1, 0] == 0.5


def test_join_offsets():
    a = const_audio(1.0, n=100)
    j = Audio.join([a, a, a])
    assert j.num_frames == 300
    overlap = Audio.join([a, a], offset=-50 / SR)
    assert overlap.num_frames == 150
    assert np.asarray(overlap.data[0])[75] == 2.0  # crossfade region sums


def test_select_crossfades():
    a = const_audio(1.0, n=100)
    b = const_audio(1.0, n=100)
    s = Audio.select([a, b], selection=0.5)
    # both balances are sqrt(1 - 0.5) -> sum = 2*sqrt(0.5)
    np.testing.assert_allclose(np.asarray(s.data[0])[50],
                               2 * np.sqrt(0.5), atol=1e-5)


def test_convolve_impulse_identity():
    """Convolving with a unit impulse reproduces the input
    (reference AudioCombination.cpp:299-353)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 200)).astype(np.float32)
    a = Audio.create_from_array(x, SR)
    imp = np.zeros((1, 50), np.float32)
    imp[0, 0] = 1.0
    ir = Audio.create_from_array(imp, SR)
    c = a.convolve(ir, normalize=False)
    assert c.num_frames == 250
    np.testing.assert_allclose(np.asarray(c.data[0, :200]), x[0], atol=1e-4)


def test_convolve_normalizes():
    a = const_audio(0.5, n=64)
    c = a.convolve(a)
    assert float(np.abs(np.asarray(c.data)).max()) == pytest.approx(
        1.0, abs=1e-5)


def test_compress_reduces_loud():
    """Louder-than-threshold content is attenuated
    (reference AudioVolume.cpp:190-278)."""
    t = np.arange(int(SR), dtype=np.float32) / SR
    x = (0.9 * np.sin(2 * np.pi * 100 * t))[None].astype(np.float32)
    a = Audio.create_from_array(x, SR)
    c = a.compress(threshold=-20.0, ratio=4.0)
    peak_in = np.abs(x).max()
    peak_out = np.abs(np.asarray(c.data)).max()
    assert peak_out < peak_in * 0.7


def test_adsr_envelope():
    a = const_audio(1.0, n=int(SR))  # 1 second
    e = a.apply_adsr_envelope(0.1, 0.1, 0.5, 0.3, sustain_level=0.5)
    d = np.asarray(e.data[0])
    assert d[0] == pytest.approx(0.0, abs=1e-4)
    assert d[int(0.05 * SR)] == pytest.approx(0.5, abs=0.02)  # mid attack
    assert d[int(0.4 * SR)] == pytest.approx(0.5, abs=0.02)   # sustain
    assert d[-1] == pytest.approx(0.0, abs=0.02)              # release end
