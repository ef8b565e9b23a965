"""Temporal method tests (reference AudioTemporal.cpp)."""
import numpy as np
import pytest

from flan_tpu import Audio

SR = 8000.0


def ramp_audio(n=1000, channels=1):
    x = np.tile(np.arange(n, dtype=np.float32)[None], (channels, 1))
    return Audio.create_from_array(x, SR)


def test_cut_frames():
    a = ramp_audio()
    c = a.cut_frames(100, 200)
    assert c.num_frames == 100
    np.testing.assert_array_equal(np.asarray(c.data[0]),
                                  np.arange(100, 200, dtype=np.float32))


def test_cut_with_fades():
    a = Audio.create_from_array(np.ones((1, 100), np.float32), SR)
    c = a.cut_frames(0, 100, 10, 10)
    d = np.asarray(c.data[0])
    assert d[0] == 0.0
    assert d[50] == 1.0
    # sqrt fade curve (reference cut -> fade_frames with sqrt interp)
    assert d[5] == pytest.approx(np.sqrt(0.5), abs=1e-5)


def test_modify_boundaries():
    a = ramp_audio(100)
    b = a.modify_boundaries_frames(-10, 20)  # pad 10 front, 20 back
    assert b.num_frames == 130
    d = np.asarray(b.data[0])
    assert (d[:10] == 0).all()
    np.testing.assert_array_equal(d[10:110], np.arange(100))
    c = a.modify_boundaries_frames(10, -20)  # trim
    assert c.num_frames == 70
    np.testing.assert_array_equal(np.asarray(c.data[0]),
                                  np.arange(10, 80, dtype=np.float32))


def test_remove_edge_silence():
    x = np.zeros((1, 300), np.float32)
    x[0, 100:200] = 0.5
    a = Audio.create_from_array(x, SR)
    b = a.remove_edge_silence(0.1)
    assert b.num_frames == 100
    assert float(np.asarray(b.data).max()) == 0.5


def test_get_loud_chunks():
    x = np.zeros((1, 1000), np.float32)
    x[0, 100:200] = 0.5
    x[0, 600:700] = 0.5
    a = Audio.create_from_array(x, SR)
    chunks = a.get_loud_chunks(0.1, minimum_gap=100 / SR)
    assert len(chunks) == 2
    assert chunks[0].num_frames == 100


def test_split_and_join_roundtrip():
    a = ramp_audio(1000)
    parts = a.split_with_equal_lengths(250 / SR)
    assert len(parts) == 4
    j = Audio.join(parts)
    # cut_frames clamps end to num_frames-1 (reference
    # AudioTemporal.cpp:218-219), so the final sample is dropped - parity.
    assert j.num_frames == 999
    np.testing.assert_allclose(np.asarray(j.data),
                               np.asarray(a.data)[:, :999], atol=1e-4)


def test_repitch_constant():
    """Constant repitch 2.0 halves the length and doubles the pitch
    (reference AudioTemporal.cpp:236-299)."""
    t = np.arange(4000, dtype=np.float32) / SR
    a = Audio.create_from_array(
        (0.5 * np.sin(2 * np.pi * 200 * t))[None], SR)
    b = a.repitch(2.0)
    assert b.num_frames == pytest.approx(2000, abs=50)
    mid = np.asarray(b.data[0, 500:1500])
    spec = np.abs(np.fft.rfft(mid))
    peak_hz = spec.argmax() * SR / len(mid)
    assert abs(peak_hz - 400) < 20


def test_iterate():
    a = ramp_audio(100)
    b = a.iterate(3)
    assert b.num_frames == 300
    c = a.iterate(2, mod=lambda audio, t: audio.modify_volume(2.0))
    np.testing.assert_allclose(np.asarray(c.data[0, :100]),
                               2 * np.arange(100), atol=1e-3)


def test_rearrange():
    a = ramp_audio(1000)
    b = a.rearrange(100 / SR, seed=0)
    assert not b.is_null()
    assert b.num_frames >= 800
