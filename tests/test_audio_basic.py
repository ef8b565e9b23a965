"""Audio constructors / conversions / info tests
(reference AudioConstructors.cpp, AudioConversions.cpp)."""
import math

import numpy as np
import pytest

from flan_tpu import Audio


def test_create_empty():
    a = Audio.create_empty_with_frames(100, 2, 8000)
    assert a.num_channels == 2
    assert a.num_frames == 100
    assert not a.is_null()
    assert Audio.create_null().is_null()


def test_mid_side_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 256)).astype(np.float32)
    a = Audio.create_from_array(x, 8000)
    ms = a.convert_to_mid_side()
    lr = ms.convert_to_left_right()
    np.testing.assert_allclose(np.asarray(lr.data), x, atol=1e-5)
    # mid/side uses the 1/sqrt(2) convention (AudioConversions.cpp:42-48)
    expected_mid = (x[0] + x[1]) / math.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(ms.data[0]), expected_mid,
                               atol=1e-5)


def test_mono_stereo():
    x = np.stack([np.ones(64, np.float32), -np.ones(64, np.float32)])
    a = Audio.create_from_array(x, 8000)
    mono = a.convert_to_mono()
    assert mono.num_channels == 1
    np.testing.assert_allclose(np.asarray(mono.data), 0.0, atol=1e-6)

    b = Audio.create_from_array(np.ones((1, 64), np.float32), 8000)
    st = b.convert_to_stereo()
    assert st.num_channels == 2
    np.testing.assert_allclose(np.asarray(st.data),
                               1.0 / math.sqrt(2.0), atol=1e-6)


def test_split_combine_channels():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 50)).astype(np.float32)
    a = Audio.create_from_array(x, 8000)
    chans = a.split_channels()
    assert len(chans) == 3
    back = Audio.combine_channels(chans)
    np.testing.assert_array_equal(np.asarray(back.data), x)


def test_energy():
    x = np.ones((2, 10), np.float32) * 0.5
    a = Audio.create_from_array(x, 8000)
    np.testing.assert_allclose(a.get_total_energy(), [2.5, 2.5])
    b = a.modify_volume(2.0)
    np.testing.assert_allclose(np.asarray(b.data), 1.0)
    diff = a.get_energy_difference(a)
    np.testing.assert_allclose(diff, [0.0, 0.0])


def test_reverse_invert():
    x = np.arange(10, dtype=np.float32)[None]
    a = Audio.create_from_array(x, 8000)
    np.testing.assert_array_equal(np.asarray(a.reverse().data), x[:, ::-1])
    np.testing.assert_array_equal(np.asarray(a.invert_phase().data), -x)


def test_wav_file_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 100)).astype(np.float32)
    a = Audio.create_from_array(x, 44100)
    p = str(tmp_path / "a.wav")
    a.save_to_file(p)
    b = Audio.load_from_file(p)
    assert b.sample_rate == 44100
    np.testing.assert_array_equal(np.asarray(b.data), x)


def test_function_parameters():
    """Nearly every parameter accepts constants or callables
    (reference Function.h:35-265)."""
    x = np.ones((1, 100), np.float32)
    a = Audio.create_from_array(x, 100.0)
    ramped = a.modify_volume(lambda t: t)  # gain = time
    d = np.asarray(ramped.data[0])
    np.testing.assert_allclose(d, np.arange(100) / 100.0, atol=1e-6)
