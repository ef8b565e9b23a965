"""Wavetable extraction and synthesis tests (reference Wavetable.cpp)."""
import numpy as np
import pytest

from flan_tpu import Audio, PitchMode, SnapMode, Wavetable

SR = 8000.0


def test_from_function_synthesis():
    from flan_tpu.func.function import waveforms
    wt = Wavetable.from_function(waveforms.sine, 4, wavelength=256,
                                 sample_rate=SR)
    assert wt.get_num_waveforms() == 4
    out = wt.synthesize(0.25, 200.0, ratio=0.0)
    assert out.num_frames == int(0.25 * SR)
    mid = np.asarray(out.data[0, 500:1500])
    spec = np.abs(np.fft.rfft(mid))
    assert abs(spec.argmax() * SR / len(mid) - 200.0) < 10


def test_extract_from_audio():
    t = np.arange(int(SR), dtype=np.float32) / SR
    a = Audio.create_from_array(
        (0.5 * np.sin(2 * np.pi * 200 * t))[None], SR)
    wt = Wavetable(a, wavelength=256)
    assert not wt.is_null()
    # ~200 waveforms in 1 second of 200 Hz (wavelength 40 > the
    # reference's minimum_wavelength=32 bound, Wavetable.cpp:161)
    assert wt.get_num_waveforms() == pytest.approx(200, rel=0.1)
    # each extracted waveform should be one sine cycle
    w = np.asarray(wt.table[0, wt.get_num_waveforms() // 2])
    spec = np.abs(np.fft.rfft(w))
    assert spec.argmax() == 1  # fundamental of the cycle


def test_extract_and_resynthesize_pitch_shift():
    t = np.arange(int(SR), dtype=np.float32) / SR
    a = Audio.create_from_array(
        (0.5 * np.sin(2 * np.pi * 200 * t))[None], SR)
    wt = Wavetable(a, wavelength=256)
    out = wt.synthesize(0.5, 330.0)
    mid = np.asarray(out.data[0, 1000:3000])
    spec = np.abs(np.fft.rfft(mid))
    assert abs(spec.argmax() * SR / len(mid) - 330.0) < 12


def test_edit_ops():
    from flan_tpu.func.function import waveforms
    wt = Wavetable.from_function(lambda t: waveforms.sine(t) + 0.3, 2,
                                 wavelength=128, sample_rate=SR)
    wt.remove_dc_in_place()
    assert abs(float(np.asarray(wt.table).mean())) < 1e-5
    wt.add_fades_in_place(16)
    assert float(np.abs(np.asarray(wt.table[0, 0, 0]))) < 1e-6
    wt.normalize_in_place()
    assert float(np.abs(np.asarray(wt.table)).max()) == pytest.approx(
        1.0, abs=1e-4)
