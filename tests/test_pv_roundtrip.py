"""Phase-vocoder round-trip tests.

Oracles per SURVEY.md section 4: round-trip waveform/energy preservation
within the reference's 2.67 OLA gain convention
(reference Conversions/AudioPV.cpp:99).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from flan_tpu import Audio

SR = 8000.0
WINDOW, HOP, DFT = 512, 64, 512


def sine_audio(freq=440.0, seconds=0.5, channels=1, sr=SR):
    t = np.arange(int(seconds * sr), dtype=np.float32) / sr
    rows = [0.5 * np.sin(2 * np.pi * freq * (i + 1) * t)
            for i in range(channels)]
    return Audio.create_from_array(np.stack(rows), sr)


def test_pv_format():
    a = sine_audio()
    pv = a.convert_to_PV(WINDOW, HOP, DFT)
    assert pv.num_bins == DFT // 2 + 1
    # reference AudioPV.cpp:17: integer division, so floor + 1
    assert pv.num_frames == a.num_frames // HOP + 1
    assert pv.analysis_rate == pytest.approx(SR / HOP)


def test_roundtrip_waveform():
    a = sine_audio()
    b = a.convert_to_PV(WINDOW, HOP, DFT).convert_to_audio()
    n = min(a.num_frames, b.num_frames)
    guard = WINDOW
    x = np.asarray(a.data)[:, guard:n - guard]
    y = np.asarray(b.data)[:, guard:n - guard]
    rel = np.sqrt(((x - y) ** 2).mean()) / np.sqrt((x ** 2).mean())
    assert rel < 0.05  # the 2.67 gain convention is itself approximate


def test_roundtrip_energy():
    a = sine_audio(freq=330, channels=2)
    b = a.convert_to_PV(WINDOW, HOP, DFT).convert_to_audio()
    n = min(a.num_frames, b.num_frames)
    guard = WINDOW
    e_in = np.asarray(a.data)[:, guard:n - guard] ** 2
    e_out = np.asarray(b.data)[:, guard:n - guard] ** 2
    ratio = e_out.sum() / e_in.sum()
    assert 0.9 < ratio < 1.1


def test_pv_frequency_estimate():
    """Phase vocoding should place the true frequency in loud bins
    (reference phase_vocoder.cpp:5-53)."""
    a = sine_audio(freq=440)
    pv = a.convert_to_PV(WINDOW, HOP, DFT)
    mag = np.asarray(pv.mag[0])
    freq = np.asarray(pv.freq[0])
    mid = pv.num_frames // 2
    peak_bin = mag[mid].argmax()
    assert abs(freq[mid, peak_bin] - 440.0) < 2.0


def test_ms_pv_roundtrip():
    a = sine_audio(channels=2)
    pv = a.convert_to_ms_PV(WINDOW, HOP, DFT)
    b = pv.convert_to_lr_audio()
    n = min(a.num_frames, b.num_frames)
    guard = WINDOW
    x = np.asarray(a.data)[:, guard:n - guard]
    y = np.asarray(b.data)[:, guard:n - guard]
    rel = np.sqrt(((x - y) ** 2).mean()) / np.sqrt((x ** 2).mean())
    assert rel < 0.05


def test_flan_file_roundtrip(tmp_path):
    a = sine_audio()
    pv = a.convert_to_PV(WINDOW, HOP, DFT)
    p = str(tmp_path / "x.flan")
    pv.save(p)
    from flan_tpu import PV
    pv2 = PV.load_from_file(p)
    assert pv2.get_format() == pv.get_format()
    np.testing.assert_allclose(np.asarray(pv.mag), np.asarray(pv2.mag),
                               atol=DFT / (1 << 23) * 1.01)
