"""Filter frequency-response tests against analytic curves.

The reference verifies filters by graphing sweep responses
(tests/flanTest.cpp:70-102); here the same oracle is automated: steady-state
sine gain vs the analytic magnitude response.
"""
import numpy as np
import pytest

from flan_tpu import Audio

SR = 8000.0


def sine(freq, seconds=0.5, amp=1.0):
    t = np.arange(int(seconds * SR), dtype=np.float32) / SR
    return Audio.create_from_array(
        (amp * np.sin(2 * np.pi * freq * t))[None], SR)


def steady_gain(filtered, original):
    a = np.asarray(filtered.data[0])
    b = np.asarray(original.data[0])
    n = len(a)
    sl = slice(n // 2, n - 100)
    return np.sqrt((a[sl] ** 2).mean() / (b[sl] ** 2).mean())


@pytest.mark.parametrize("freq,expected", [
    (250.0, 1 / np.sqrt(1 + (250 / 500) ** 2)),
    (500.0, 1 / np.sqrt(2)),
    (1000.0, 1 / np.sqrt(1 + 4.0)),
])
def test_1pole_lowpass_response(freq, expected):
    x = sine(freq)
    y = x.filter_1pole_lowpass(500.0, 1)
    assert steady_gain(y, x) == pytest.approx(expected, rel=0.05)


def test_1pole_highpass_complements_lowpass():
    x = sine(500.0)
    lo = x.filter_1pole_lowpass(500.0, 1)
    hi = x.filter_1pole_highpass(500.0, 1)
    # lp + hp = input exactly for the TPT 1-pole
    total = np.asarray(lo.data) + np.asarray(hi.data)
    np.testing.assert_allclose(total, np.asarray(x.data), atol=1e-3)


def test_butterworth_order4_rolloff():
    """Order-4 Butterworth: |H| = 1/sqrt(1+(f/fc)^8)."""
    x = sine(1000.0)
    y = x.filter_1pole_lowpass(500.0, 4)
    expected = 1 / np.sqrt(1 + (1000 / 500) ** 8)
    assert steady_gain(y, x) == pytest.approx(expected, rel=0.2)
    # passband nearly unity
    xp = sine(100.0)
    yp = xp.filter_1pole_lowpass(500.0, 4)
    assert steady_gain(yp, xp) == pytest.approx(1.0, abs=0.03)


def test_2pole_bandpass_peak():
    x_on = sine(500.0)
    x_off = sine(1500.0)
    on = steady_gain(x_on.filter_2pole_bandpass(500.0, 0.5), x_on)
    off = steady_gain(x_off.filter_2pole_bandpass(500.0, 0.5), x_off)
    assert on > 0.8
    assert off < 0.35


def test_2pole_notch_kills_center():
    x = sine(500.0)
    y = x.filter_2pole_notch(500.0, 0.3)
    assert steady_gain(y, x) < 0.1
    x2 = sine(100.0)
    assert steady_gain(x2.filter_2pole_notch(500.0, 0.3), x2) > 0.9


def test_lowshelf_boosts_lows():
    """DC gain hits the full shelf amount; response decreases toward unity
    above the (wide) 1-pole transition. The analytic tilt response
    sqrt((M^2(Mfc)^2+f^2/M^2)/((Mfc)^2+f^2)) * M^order is still ~2.0 at
    2 kHz for fc=500/gain=12dB, so only monotonicity is asserted there."""
    lo = sine(100.0)
    mid = sine(1000.0)
    hi = sine(2500.0)
    g_lo = steady_gain(lo.filter_1pole_lowshelf(500.0, 12.0), lo)
    g_mid = steady_gain(mid.filter_1pole_lowshelf(500.0, 12.0), mid)
    g_hi = steady_gain(hi.filter_1pole_lowshelf(500.0, 12.0), hi)
    assert g_lo == pytest.approx(10 ** (12 / 20), rel=0.15)
    assert g_lo > g_mid > g_hi
    assert g_hi < 1.8


def test_comb_notches():
    """Comb with cutoff w notches odd multiples of w
    (delay = 1/(2w), reference AudioFilter.cpp:1031)."""
    x_notch = sine(500.0)
    x_peak = sine(1000.0)
    g_notch = steady_gain(x_notch.filter_comb(500.0, 0.0, 0.5), x_notch)
    g_peak = steady_gain(x_peak.filter_comb(500.0, 0.0, 0.5), x_peak)
    assert g_notch < 0.1
    assert g_peak > 0.9


def test_multinotch_passthrough_and_allpass():
    x = sine(440.0)
    # k=0, mix=1 -> pure passthrough of x_bar = x
    y = x.filter_1pole_multinotch(4, 700.0, feedback=0.0, wet_dry=1.0)
    np.testing.assert_allclose(np.asarray(y.data), np.asarray(x.data),
                               atol=1e-3)
    # k=0, mix=0 -> pure allpass cascade: energy preserved
    y2 = x.filter_1pole_multinotch(4, 700.0, feedback=0.0, wet_dry=0.0)
    assert steady_gain(y2, x) == pytest.approx(1.0, abs=0.05)


def test_2pole_multinotch_allpass():
    x = sine(440.0)
    y = x.filter_2pole_multinotch(2, 700.0, 0.5, feedback=0.0, wet_dry=0.0)
    assert steady_gain(y, x) == pytest.approx(1.0, abs=0.05)
    assert np.isfinite(np.asarray(y.data)).all()


def test_shift_frequency():
    x = sine(440.0, seconds=1.0, amp=0.5)
    y = x.shift_frequency(200.0)
    d = np.asarray(y.data[0])
    mid = d[2000:6000]
    spec = np.abs(np.fft.rfft(mid))
    peak_hz = spec.argmax() * SR / len(mid)
    assert abs(peak_hz - 640.0) < 15.0
    # negative sideband (240 Hz) suppressed relative to 640
    bin_of = lambda f: int(round(f * len(mid) / SR))
    assert spec[bin_of(240)] < 0.2 * spec[bin_of(640)]


def test_saturator_multinotch_runs():
    x = sine(440.0, seconds=0.05)
    y = x.filter_1pole_multinotch(2, 700.0, feedback=0.5, wet_dry=0.3,
                                  use_saturator=True)
    assert np.isfinite(np.asarray(y.data)).all()
