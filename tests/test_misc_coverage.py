"""Coverage for less-traveled API paths."""
import numpy as np
import pytest

from flan_tpu import Audio, Pipe, adsr

SR = 8000.0


def sine(freq=440.0, seconds=0.5, amp=0.5, channels=1):
    t = np.arange(int(seconds * SR), dtype=np.float32) / SR
    rows = [amp * np.sin(2 * np.pi * freq * t)] * channels
    return Audio.create_from_array(np.stack(rows), SR)


def test_texture_effect():
    a = sine(seconds=0.5)
    out = a.texture_effect(8.0, 0.0, effect_length=0.1,
                           mod=lambda x, t: x.modify_volume(0.0), seed=4)
    # effected sections are silenced; some of the file must now be quiet
    d = np.asarray(out.data[0])
    orig = np.asarray(a.data[0])
    assert out.num_frames == a.num_frames
    assert np.abs(d).mean() < np.abs(orig).mean()


def test_iterate_feedback():
    a = sine(seconds=0.1)
    out = a.iterate(3, mod=lambda x, t: x.modify_volume(0.5),
                    feedback=True)
    d = np.asarray(out.data[0])
    n = a.num_frames
    # feedback halves each iteration: 0.5, 0.25, 0.125
    assert np.abs(d[:n]).max() == pytest.approx(0.25, rel=0.1)
    assert np.abs(d[2 * n:]).max() == pytest.approx(0.0625, rel=0.1)


def test_compress_sidechain():
    loud = sine(amp=0.9, seconds=0.5)
    quiet = sine(amp=0.1, seconds=0.5)
    ducked = quiet.compress(threshold=-20.0, ratio=10.0,
                            sidechain_source=loud)
    plain = quiet.compress(threshold=-20.0, ratio=10.0)
    # the loud sidechain ducks the quiet signal harder than self-keying
    assert (np.abs(np.asarray(ducked.data)).max()
            < np.abs(np.asarray(plain.data)).max())


def test_halfband_multiply():
    a = sine(300.0, seconds=0.5)
    b = sine(200.0, seconds=0.5)
    out = a.halfband_multiply(b)
    d = np.asarray(out.data[0, 1000:3000])
    spec = np.abs(np.fft.rfft(d))
    f = lambda hz: int(round(hz * len(d) / SR))
    # analytic-signal product keeps the sum frequency, suppresses the
    # difference (reference AudioFilter.cpp:1240-1262)
    assert spec[f(500) - 3:f(500) + 4].max() > \
        3 * spec[f(100) - 3:f(100) + 4].max()


def test_random_chunks():
    a = sine(seconds=1.0)
    out = a.random_chunks(0.5, chunk_length=0.1, fade=0.01, seed=3)
    assert not out.is_null()
    assert out.num_frames >= int(0.4 * SR)
    assert np.isfinite(np.asarray(out.data)).all()


def test_select_audio():
    a = sine(220.0, amp=0.5, seconds=0.25)
    b = sine(880.0, amp=0.5, seconds=0.25)
    out = Audio.select([a, b], selection=lambda t: t * 8.0)
    d = np.asarray(out.data[0])
    early = np.abs(np.fft.rfft(d[:500]))
    f = lambda hz, n: int(round(hz * n / SR))
    assert early[f(220, 500) - 2:f(220, 500) + 3].max() > \
        early[f(880, 500) - 2:f(880, 500) + 3].max()


def test_adsr_function():
    env = adsr(0.1, 0.1, 0.2, 0.1, 0.5)
    import jax.numpy as jnp
    ts = jnp.asarray([0.05, 0.15, 0.3, 0.55])
    vals = np.asarray(env(ts))
    assert vals[0] == pytest.approx(0.5, abs=0.01)   # mid attack
    assert vals[1] == pytest.approx(0.75, abs=0.01)  # mid decay
    assert vals[2] == pytest.approx(0.5, abs=0.01)   # sustain
    assert vals[3] == pytest.approx(0.0, abs=0.01)   # after release


def test_pipe_composition():
    p = Pipe(lambda a: a.modify_volume(2.0)) >> (
        lambda a: a.modify_volume(0.25))
    a = sine(amp=0.4)
    out = p(a)
    assert np.abs(np.asarray(out.data)).max() == pytest.approx(0.2,
                                                               rel=0.01)


def test_waveshape_hard_clip():
    import jax.numpy as jnp
    a = sine(amp=1.0, seconds=0.25)
    out = a.waveshape(lambda t, s: jnp.clip(s, -0.5, 0.5),
                      oversample_factor=2)
    assert np.abs(np.asarray(out.data)).max() == pytest.approx(0.5,
                                                               abs=0.05)


def test_convert_to_function():
    a = sine(seconds=0.1)
    fn = a.convert_to_function()
    import jax.numpy as jnp
    v = float(np.asarray(fn(jnp.float32(0.05))))
    expected = float(a.data[0, int(0.05 * SR)])
    assert v == pytest.approx(expected, abs=1e-5)


def test_add_moisture_zero_amount_is_identity():
    """amount=0 leaves the signal untouched up to the oversample
    round-trip (reference AudioVolume.cpp:168-188)."""
    a = sine(freq=100.0, seconds=0.5)
    out = a.add_moisture(0.0)
    n = min(a.num_frames, out.num_frames)
    g = 500  # resampler edge guard
    x = np.asarray(a.data)[:, g:n - g]
    y = np.asarray(out.data)[:, g:n - g]
    rel = np.sqrt(((x - y) ** 2).mean()) / np.sqrt((x ** 2).mean())
    assert rel < 0.02  # bounded by the oversample resampler round trip


def test_add_moisture_adds_harmonics():
    a = sine(freq=100.0, seconds=0.5)
    out = a.add_moisture(0.5, frequency=300.0)
    n = min(a.num_frames, out.num_frames)
    g = 500

    def hf_fraction(d):
        w = np.hanning(n - 2 * g)  # window away leakage of the raw sine
        s = np.abs(np.fft.rfft(d[0, g:n - g] * w)) ** 2
        freqs = np.fft.rfftfreq(n - 2 * g, 1 / SR)
        return s[freqs > 400].sum() / s.sum()

    assert hf_fraction(np.asarray(a.data)) < 1e-6
    assert hf_fraction(np.asarray(out.data)[:, :n]) > 1e-2
    assert np.isfinite(np.asarray(out.data)).all()
