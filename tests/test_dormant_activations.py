"""Tests for upstream-dormant methods activated here: stereo_delay,
filter_pinna, synthesize_pulsars (Audio) and perturb (PV).

The reference ships these commented out (AudioTemporal.cpp:363-408,
AudioSpatial.cpp:69-84, Audio.h:1139-1145, PV.cpp:460-548); the
activations follow the commented code's semantics where it exists, with
deviations documented in the implementations.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from flan_tpu import PV
from flan_tpu.audio import Audio

SR = 8000.0


def _stereo(n=4000):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, n)).astype(np.float32) * 0.3
    return Audio(data=jnp.asarray(x), sample_rate=SR)


def _ring_reference(x, out_n, dl, dr, g, lb, rb):
    """Literal transcription of the commented ring-buffer loop."""
    lbuf = np.zeros(lb, np.float64)
    rbuf = np.zeros(rb, np.float64)
    out = np.zeros((2, out_n), np.float64)
    n = x.shape[1]
    for t in range(out_n):
        ll, rl = t % lb, t % rb
        lf = (t + lb - dl[t]) % lb
        rf = (t + rb - dr[t]) % rb
        out[0, t] = lbuf[ll]
        out[1, t] = rbuf[rl]
        xl = x[0, t] if t < n else 0.0
        xr = x[1, t] if t < n else 0.0
        lbuf[ll] = xl + rbuf[rf] * g[t]
        rbuf[rl] = xr + lbuf[lf] * g[t]
    return out


def test_stereo_delay_matches_ring_reference_constant():
    a = _stereo(2000)
    out = a.stereo_delay(0.5, 0.05, 0.08, 0.5)
    out_n = int(0.5 * SR)
    dl, dr = int(0.05 * SR), int(0.08 * SR)
    ref = _ring_reference(np.asarray(a.data), out_n,
                          np.full(out_n, dl), np.full(out_n, dr),
                          np.full(out_n, 0.5), dl, dr)
    got = np.asarray(out.data)
    assert got.shape == (2, out_n)
    assert np.abs(got - ref).max() < 1e-4


def test_stereo_delay_scan_path_matches_ring_reference():
    a = _stereo(1500)
    # constant-valued lambdas force the time-varying (scan) path; the
    # f32 Function sampling can truncate one frame lower than the f64
    # constant path (0.03f * 8000 = 239.99... -> 239), so compare against
    # the ring reference at the scan path's own sampled delays
    slow = a.stereo_delay(0.4, lambda t: 0.03 + 0.0 * t,
                          lambda t: 0.05 + 0.0 * t, 0.6)
    out_n = int(0.4 * SR)
    # f64 arithmetic on the f32-rounded constants (NEP-50 weak promotion
    # would round 239.9999... back up to 240 in f32)
    dl = int(np.float64(np.float32(0.03)) * SR)
    dr = int(np.float64(np.float32(0.05)) * SR)
    ref = _ring_reference(np.asarray(a.data), out_n,
                          np.full(out_n, dl), np.full(out_n, dr),
                          np.full(out_n, 0.6), dl, dr)
    assert np.abs(np.asarray(slow.data) - ref).max() < 1e-4


def test_stereo_delay_requires_stereo():
    mono = Audio(data=jnp.zeros((1, 100), jnp.float32), sample_rate=SR)
    assert mono.stereo_delay(0.1, 0.01, 0.01, 0.5).is_null()


def test_filter_pinna_elevation_tilts_high_band():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((1, 16000)) * 0.2).astype(np.float32)
    a = Audio(data=jnp.asarray(x), sample_rate=48000.0)

    def band_energy(audio, lo, hi):
        s = np.abs(np.fft.rfft(np.asarray(audio.data[0])))
        f = np.fft.rfftfreq(audio.num_frames, 1 / 48000.0)
        return float((s[(f >= lo) & (f < hi)] ** 2).sum())

    up = a.filter_pinna(5.0)      # source high above -> positive gains
    down = a.filter_pinna(-5.0)   # below -> negative gains
    assert not up.is_null() and not down.is_null()
    assert band_energy(up, 6000, 10000) > band_energy(down, 6000, 10000)


def test_synthesize_pulsars_basic():
    from flan_tpu.func.function import waveforms
    length, pf, wf = 0.5, 100.0, 400.0
    out = Audio.synthesize_pulsars(
        length, pf, waveforms.sine, wf,
        lambda p: 0.5 - 0.5 * jnp.cos(2 * np.pi * p), sample_rate=SR)
    assert not out.is_null()
    assert abs(out.num_frames - int(length * SR)) <= 2
    d = np.asarray(out.data[0])
    # pulse periodicity: strong autocorrelation at the 100 Hz lag
    lag = int(SR / pf)
    ac = np.correlate(d, d, mode="full")[d.size - 1:]
    assert ac[lag] > 0.5 * ac[0]
    # pulsaret carrier puts the spectral peak near wf (skip the first
    # bins so the pulse-rate fundamental cannot win)
    s = np.abs(np.fft.rfft(d))
    f = np.fft.rfftfreq(d.size, 1 / SR)
    assert abs(f[10 + np.argmax(s[10:])] - wf) < 120.0


def test_perturb_deterministic_and_gated():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((1, 4000)) * 0.2).astype(np.float32)
    pv = Audio(data=jnp.asarray(x), sample_rate=SR).convert_to_PV(
        512, 64, 512)
    p1 = pv.perturb((0.01, 30.0), 0.9, seed=5)
    p2 = pv.perturb((0.01, 30.0), 0.9, seed=5)
    p3 = pv.perturb((0.01, 30.0), 0.9, seed=6)
    assert np.array_equal(np.asarray(p1.freq), np.asarray(p2.freq))
    assert not np.array_equal(np.asarray(p1.freq), np.asarray(p3.freq))
    # zero stds are an exact identity
    p0 = pv.perturb((0.0, 0.0), 0.9, seed=5)
    assert np.array_equal(np.asarray(p0.mag), np.asarray(pv.mag))
    assert np.array_equal(np.asarray(p0.freq), np.asarray(pv.freq))
    # frequencies moved, magnitudes moved, shapes preserved
    assert p1.mag.shape == pv.mag.shape
    df = np.abs(np.asarray(p1.freq) - np.asarray(pv.freq))
    assert df.max() > 0.1
    dm = np.abs(np.asarray(p1.mag) - np.asarray(pv.mag))
    assert dm.max() > 0.0


def test_perturb_null_propagates():
    assert PV.create_null().perturb((1.0, 1.0)).is_null()
