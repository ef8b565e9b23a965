"""Analytic forward-transform golden for the phase vocoder.

Unlike the round-trip tests (energy/waveform self-consistency), these
assert the *forward* PV values against numbers derivable by hand from the
reference's semantics (reference Conversions/AudioPV.cpp:12-78,
phase_vocoder.cpp:5-61):

For x[n] = A sin(2 pi f0 n / sr) with f0 exactly on DFT bin k
(f0 = k * sr / dft_size):

* Magnitude: each analysis frame is x windowed by the symmetric hann
  window w (sum w = (N-1)/2, |W(+-1 bin)| ~= (N-1)/4). The windowed DFT
  at the sine's bin is A/2 * W(0), so
      mag[k]    ~= A (N-1) / 4
      mag[k+-1] ~= A (N-1) / 8
  (small corrections from the negative-frequency image and the
  symmetric-vs-periodic window mismatch; tolerances below cover them).

* Frequency: a steady sinusoid advances phase by exactly
  2 pi f0 hop / sr per hop in every bin that carries its energy. The
  vocoder reports bin_freq + wrap(delta - expected)/(2 pi) * analysis_rate
  which telescopes to exactly f0 whenever |f0 - bin_freq| <
  analysis_rate / 2 (phase_vocoder.cpp:38-53). So the freq plane must
  read f0 - not "approximately the peak" - in bins k-1, k, k+1.
"""
import numpy as np
import pytest

from flan_tpu import Audio

SR = 8000.0
WINDOW, HOP, DFT = 512, 64, 512
A = 0.5
K = 32                      # target bin
F0 = K * SR / DFT           # 500 Hz, exactly bin-centered


def make_pv():
    n = int(SR)  # 1 second
    t = np.arange(n, dtype=np.float64) / SR
    x = (A * np.sin(2 * np.pi * F0 * t)).astype(np.float32)
    return Audio.create_from_array(x[None], SR).convert_to_PV(
        WINDOW, HOP, DFT)


def test_forward_magnitude_matches_hand_values():
    pv = make_pv()
    mag = np.asarray(pv.mag[0])
    mid = pv.num_frames // 2
    # steady state: every interior frame has the same magnitude profile
    np.testing.assert_allclose(mag[mid], mag[mid + 3], atol=1e-3)
    peak = A * (WINDOW - 1) / 4.0
    assert mag[mid, K] == pytest.approx(peak, rel=2e-2)
    assert mag[mid, K - 1] == pytest.approx(peak / 2.0, rel=6e-2)
    assert mag[mid, K + 1] == pytest.approx(peak / 2.0, rel=6e-2)
    # hann mainlobe is 2 bins wide for an exact-bin sine: outside it the
    # magnitude collapses by >20 dB
    assert mag[mid, K + 3] < peak / 10
    assert mag[mid, : K - 4].max() < peak / 10
    # the peak must be at bin K, nowhere else
    assert mag[mid].argmax() == K


def test_forward_frequency_reads_exactly_f0():
    pv = make_pv()
    freq = np.asarray(pv.freq[0])
    mid = pv.num_frames // 2
    for b in (K - 1, K, K + 1):
        assert freq[mid, b] == pytest.approx(F0, abs=0.05)
    # and across the whole interior, not just one frame
    interior = freq[WINDOW // HOP: -(WINDOW // HOP), K]
    np.testing.assert_allclose(interior, F0, atol=0.05)


def test_forward_frequency_off_bin_sine():
    """A sine between bins must still read its true frequency in the
    loud bins (the vocoder's whole point, phase_vocoder.cpp:47-53)."""
    f0 = (K + 0.5) * SR / DFT  # exactly between bins K and K+1
    n = int(SR)
    t = np.arange(n, dtype=np.float64) / SR
    x = (A * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    pv = Audio.create_from_array(x[None], SR).convert_to_PV(
        WINDOW, HOP, DFT)
    mid = pv.num_frames // 2
    freq = np.asarray(pv.freq[0])
    for b in (K, K + 1):
        assert freq[mid, b] == pytest.approx(f0, abs=0.05)


def test_forward_first_frame_zero_initial_phase():
    """Frame 0 diffs against a zero phase buffer (AudioPV.cpp:44-50):
    its freq values are NOT f0 (they encode the absolute phase), which is
    the documented reference behavior - guard against 'fixing' it."""
    pv = make_pv()
    freq = np.asarray(pv.freq[0])
    mid = pv.num_frames // 2
    assert abs(freq[mid, K] - F0) < 0.05
    # first frame uses phase - 0 - expected: generically off f0
    assert abs(freq[0, K] - F0) > 0.5
