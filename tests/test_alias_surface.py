"""Locks the parity-alias tail of the public surface: the reference's
*_in_place methods (Audio.h:541-592; JAX buffers are immutable so they
alias the pure variants), buffer constructors, and mixed-rate input
normalization (AudioCombination.cpp:17-35)."""
import numpy as np

from flan_tpu import Audio, PV

SR = 8000.0


def _audio(n=2048, ch=2):
    t = np.arange(n, dtype=np.float32) / SR
    x = 0.25 * np.sin(2 * np.pi * 330 * t)
    return Audio.create_from_array(np.stack([x] * ch), SR)


def test_create_from_buffer_channel_major():
    flat = np.arange(12, dtype=np.float32)
    a = Audio.create_from_buffer(flat, 3, SR)
    assert a.data.shape == (3, 4)
    np.testing.assert_array_equal(np.asarray(a.data[1]), flat[4:8])


def test_match_sample_rates_noop_when_equal():
    assert Audio.match_sample_rates_or_return_null([_audio(), _audio()]) == []
    assert Audio.match_sample_rates_or_return_null([]) == []


def test_match_sample_rates_resamples_to_highest():
    lo = Audio(data=_audio().data, sample_rate=4000.0)
    hi = _audio()
    out = Audio.match_sample_rates_or_return_null([lo, hi])
    assert [a.sample_rate for a in out] == [SR, SR]
    # the low-rate clip doubles in frames (4k -> 8k)
    assert abs(out[0].num_frames - 2 * lo.num_frames) <= 4


def test_in_place_aliases_match_pure_variants():
    a = _audio()
    np.testing.assert_array_equal(
        np.asarray(a.modify_volume_in_place(0.5).data),
        np.asarray(a.modify_volume(0.5).data))
    np.testing.assert_array_equal(
        np.asarray(a.fade_frames_in_place(64, 64).data),
        np.asarray(a.fade_frames(64, 64).data))


def test_mix_in_place_keeps_own_length():
    a = _audio(n=2048)
    b = _audio(n=4096)
    out = a.mix_in_place(b, other_start_time=0.05, other_amplitude=0.5)
    assert out.num_frames == a.num_frames
    assert out.num_channels == a.num_channels


def test_pv_camelcase_and_contour_aliases():
    from flan_tpu.pv import information as _info
    assert PV.Contour is _info.Contour
    pv = _audio().convert_to_PV(512, 64, 512)
    np.testing.assert_array_equal(
        np.asarray(pv.getBinInterpolated(0, 1.5, 2.5)),
        np.asarray(pv.get_bin_interpolated(0, 1.5, 2.5)))
