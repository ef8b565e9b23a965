"""WAV and .flan codec round-trip tests (reference formats:
AudioBuffer.cpp:70-190, PVBuffer.h:85-113)."""
import numpy as np
import pytest

from flan_tpu.core.audio_buffer import SndfileStrings
from flan_tpu.io.wav import read_wav, write_wav
from flan_tpu.io.flan_format import read_flan, write_flan


def test_wav_float32_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 1000)).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 48000)
    y, sr, _ = read_wav(p)
    assert sr == 48000
    np.testing.assert_array_equal(x, y)


@pytest.mark.parametrize("bits", [16, 24, 32])
def test_wav_pcm_roundtrip(tmp_path, bits):
    rng = np.random.default_rng(1)
    x = np.clip(rng.standard_normal((1, 500)).astype(np.float32) * 0.3,
                -1, 1)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 44100, bits=bits, float_format=False)
    y, sr, _ = read_wav(p)
    assert sr == 44100
    tol = 1.1 / (1 << (bits - 1))
    assert np.max(np.abs(x - y)) < tol


def test_wav_metadata_roundtrip(tmp_path):
    x = np.zeros((1, 10), np.float32)
    s = SndfileStrings(title="a song", artist="someone", comment="hi",
                       genre="noise")
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 48000, strings=s)
    _, _, s2 = read_wav(p)
    assert s2.title == "a song"
    assert s2.artist == "someone"
    assert s2.comment == "hi"
    assert s2.genre == "noise"


def test_flan_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    c, f, b = 2, 7, 129
    dft = 2 * (b - 1)
    mag = (rng.random((c, f, b)) * dft).astype(np.float32)
    freq = (rng.random((c, f, b)) * 20000).astype(np.float32)
    p = str(tmp_path / "t.flan")
    write_flan(p, mag, freq, 48000.0, 64, 256)
    m2, f2, sr, hop, win = read_flan(p)
    assert (sr, hop, win) == (48000.0, 64, 256)
    # 24-bit truncation (1 LSB) plus float32 rounding headroom
    assert np.max(np.abs(mag - m2)) <= dft / (1 << 23) * 2
    assert np.max(np.abs(freq - f2)) <= 48000 / (1 << 23) * 2
