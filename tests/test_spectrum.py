"""Spectrum: the activated dormant layer (reference Spectrum.h /
SpectrumBuffer.cpp are fully commented out; flan_tpu/spectrum.py
implements what they sketch)."""
import numpy as np
import pytest

from flan_tpu import Audio
from flan_tpu.spectrum import Spectrum

SR = 8000.0


def _tone(freqs, amps, n=4096):
    t = np.arange(n, dtype=np.float32) / SR
    x = sum(a * np.sin(2 * np.pi * f * t) for f, a in zip(freqs, amps))
    return Audio.create_from_array(np.stack([x, 0.5 * x]), SR)


def test_round_trip_identity():
    a = _tone([440.0], [0.5])
    back = a.convert_to_spectrum().convert_to_audio()
    assert back.sample_rate == SR
    np.testing.assert_allclose(np.asarray(back.data), np.asarray(a.data),
                               atol=1e-5)


def test_multiply_filters_bins():
    # brick-wall: zero every bin above 600 Hz, keep the 440 tone and
    # kill the 1200 one
    a = _tone([440.0, 1200.0], [0.5, 0.5])
    spec = a.convert_to_spectrum()
    # true bins per Hz is n/sr = 2*(bins-1)/sr; the sketched scalar
    # (num_bins/sr, preserved as-is) is the half-spectrum variant
    bins_per_hz = 2 * (spec.num_bins - 1) / SR
    mask = (np.arange(spec.num_bins) <= 600.0 * bins_per_hz)
    filt = Spectrum(data=mask[None].astype(np.complex64), sample_rate=SR)
    y = np.asarray(spec.multiply(filt).convert_to_audio().data)
    f = np.fft.rfftfreq(y.shape[-1], 1 / SR)
    mag = np.abs(np.fft.rfft(y[0]))
    assert mag[np.argmin(np.abs(f - 440))] > 100 * mag[
        np.argmin(np.abs(f - 1200))]


def test_multiply_validates_shapes():
    a = _tone([440.0], [0.5]).convert_to_spectrum()
    with pytest.raises(ValueError, match="bin count"):
        a.multiply(Spectrum(data=np.ones((1, 7), np.complex64),
                            sample_rate=SR))
    with pytest.raises(ValueError, match="channel count"):
        a.multiply(Spectrum(data=np.ones((3, a.num_bins), np.complex64),
                            sample_rate=SR))


def test_multiply_null_propagates():
    a = _tone([440.0], [0.5]).convert_to_spectrum()
    assert a.multiply(Spectrum()).is_null()
    assert Spectrum().multiply(a).is_null()


def test_bin_frequency_maps_match_sketch():
    # the sketched scalar is num_bins / sample_rate (SpectrumBuffer.cpp:45)
    spec = _tone([440.0], [0.5]).convert_to_spectrum()
    assert spec.frequency_to_bin() == spec.num_bins / SR
    assert spec.bin_to_frequency() == pytest.approx(
        1.0 / spec.frequency_to_bin())


def test_max_spectra_magnitude():
    # bin-exact tone (225 * SR / 4096) so there is no leakage and the
    # rFFT peak is exactly amp * n/2
    a = _tone([225 * SR / 4096], [0.5], n=4096)
    spec = a.convert_to_spectrum()
    assert spec.get_max_spectra_magnitude() == pytest.approx(
        0.5 * 4096 / 2, rel=0.01)
    assert Spectrum().get_max_spectra_magnitude() == 0.0
