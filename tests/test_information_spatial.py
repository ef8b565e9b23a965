"""Pitch tracking / envelopes / spatialization tests
(reference AudioInformation.cpp, AudioSpatial.cpp)."""
import numpy as np
import pytest

from flan_tpu import Audio

SR = 8000.0


def sine(freq, seconds=0.5, amp=0.5):
    t = np.arange(int(seconds * SR), dtype=np.float32) / SR
    return Audio.create_from_array(
        (amp * np.sin(2 * np.pi * freq * t))[None], SR)


def test_local_wavelength():
    a = sine(200.0)  # wavelength = 40 frames
    wl = a.get_local_wavelength(0, 100, 1024)
    assert wl == pytest.approx(40.0, abs=1.0)


def test_local_frequencies():
    a = sine(250.0, seconds=1.0)
    freqs = a.get_local_frequencies(0, 0, -1, 1024, 256)
    freqs = freqs[freqs > 0]
    assert len(freqs) > 5
    assert np.median(freqs) == pytest.approx(250.0, rel=0.03)


def test_amplitude_envelope():
    t = np.arange(int(SR), dtype=np.float32) / SR
    env_true = np.minimum(t, 1.0 - t) * 2  # triangle envelope
    x = (env_true * np.sin(2 * np.pi * 500 * t)).astype(np.float32)
    a = Audio.create_from_array(x[None], SR)
    env = a.get_amplitude_envelope(0.05)
    import jax.numpy as jnp
    mid = float(np.asarray(env(jnp.float32(0.5))))
    quarter = float(np.asarray(env(jnp.float32(0.25))))
    assert mid == pytest.approx(1.0, rel=0.2)
    assert quarter == pytest.approx(0.5, rel=0.25)


def test_pan_hard():
    """pan(-1) silences channel 0 and leaves channel 1 at full scale
    (reference AudioSpatial.cpp:29-37: channel-0 scale = sine2(pan01))."""
    a = sine(300.0, seconds=0.1).convert_to_stereo()
    panned = a.pan(-1.0)
    d = np.asarray(panned.data)
    assert np.abs(d[1]).max() > np.abs(d[0]).max() * 10


def test_widen_runs():
    a = sine(300.0, seconds=0.1).convert_to_stereo()
    w = a.widen(0.5)
    assert w.num_channels == 2
    assert np.isfinite(np.asarray(w.data)).all()


def test_stereo_spatialize_left_louder():
    a = sine(300.0, seconds=0.2)
    s = a.stereo_spatialize(np.array([0.0, 2.0]))  # 2 m to the left
    assert s.num_channels == 2
    d = np.asarray(s.data)
    el = (d[0] ** 2).sum()
    er = (d[1] ** 2).sum()
    assert el > er  # nearer ear louder


def test_stereo_spatialize_itd():
    """A distant source arrives later than a near one."""
    x = np.zeros((1, 800), np.float32)
    x[0, 0] = 1.0
    a = Audio.create_from_array(x, SR)
    near = a.stereo_spatialize(np.array([1.0, 0.0]))
    far = a.stereo_spatialize(np.array([20.0, 0.0]))
    onset = lambda d: int(np.argmax(np.abs(np.asarray(d.data[0]))
                                    > 1e-3 * np.abs(
                                        np.asarray(d.data[0])).max()))
    # 19 extra meters ~ 55 ms ~ 443 frames at 8 kHz
    assert onset(far) - onset(near) == pytest.approx(
        19.0 / 343.0 * SR, abs=30)
