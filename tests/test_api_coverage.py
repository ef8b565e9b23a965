"""Coverage for public API paths with no other test references.

Each test targets methods flagged by a mechanical audit (grep of tests/
for every public Audio/PV/SPV attribute name): shelving filters, band
splits, modulation, envelopes, silence removal, splits, accessors, and
ms-domain SPV/SQPV conversions.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from flan_tpu import Audio, PV

SR = 8000.0


def sine(freq=440.0, seconds=0.5, amp=0.5, channels=1):
    t = np.arange(int(seconds * SR), dtype=np.float32) / SR
    rows = [amp * np.sin(2 * np.pi * freq * t)] * channels
    return Audio.create_from_array(np.stack(rows), SR)


def band_gain(audio, ref, freq):
    """Output/input magnitude ratio at freq via windowed DFT probes."""
    n = min(audio.num_frames, ref.num_frames)
    g = 256
    w = np.hanning(n - 2 * g)
    t = np.arange(n - 2 * g) / SR
    probe = np.exp(-2j * np.pi * freq * t) * w

    def mag(a):
        return np.abs((np.asarray(a.data[0, g:n - g]) * probe).sum())

    return mag(audio) / max(mag(ref), 1e-12)


# --- shelving filters (reference AudioFilter.cpp:430-521, 816-870) --------
def test_1pole_highshelf_boosts_highs():
    lo, hi = sine(100.0, amp=0.3), sine(3000.0, amp=0.3)
    mixed = Audio.mix([lo, hi])
    out = mixed.filter_1pole_highshelf(800.0, 12.0)
    assert band_gain(out, mixed, 3000.0) == pytest.approx(10 ** 0.6,
                                                          rel=0.25)
    # a 1-pole shelf's transition is shallow: 3 octaves below the cutoff
    # still carries some boost, but far less than the shelf side
    assert band_gain(out, mixed, 100.0) < 1.6


def test_2pole_lowshelf_tilts_lows_down():
    """Reference semantics: the 2-pole shelves are raw Butterworth TILTS -
    lowshelf with positive gain mixes lp/M^4 (AudioFilter.cpp:717-721),
    ATTENUATING the low side by the full gain while highs stay at unity
    (the normalizing modify_volume is commented out upstream)."""
    mixed = Audio.mix([sine(100.0, amp=0.3), sine(3000.0, amp=0.3)])
    out = mixed.filter_2pole_lowshelf(800.0, 0.7, 12.0)
    assert band_gain(out, mixed, 100.0) == pytest.approx(10 ** -0.6,
                                                         rel=0.3)
    assert band_gain(out, mixed, 3000.0) == pytest.approx(1.0, abs=0.2)


def test_2pole_highshelf_and_bandshelf():
    mixed = Audio.mix([sine(100.0, amp=0.2), sine(900.0, amp=0.2),
                       sine(3000.0, amp=0.2)])
    hs = mixed.filter_2pole_highshelf(800.0, 0.7, 6.0)
    assert band_gain(hs, mixed, 3000.0) > 1.5
    bs = mixed.filter_2pole_bandshelf(900.0, 0.5, 12.0)
    assert band_gain(bs, mixed, 900.0) > 1.5


# --- band splits (reference AudioFilter.cpp:392-424, 640-676) -------------
def test_1pole_split_reconstructs():
    """TPT 1-pole lp + hp = input exactly."""
    x = sine(700.0)
    lo, hi = x.filter_1pole_split(500.0, 1)
    n = min(lo.num_frames, hi.num_frames, x.num_frames)
    np.testing.assert_allclose(
        np.asarray(lo.data[:, :n] + hi.data[:, :n]),
        np.asarray(x.data[:, :n]), atol=1e-4)


def test_2pole_split_bands():
    mixed = Audio.mix([sine(100.0, amp=0.3), sine(3000.0, amp=0.3)])
    lo, hi = mixed.filter_2pole_split(700.0, 2)
    assert band_gain(lo, mixed, 100.0) > 0.7
    assert band_gain(lo, mixed, 3000.0) < 0.2
    assert band_gain(hi, mixed, 3000.0) > 0.7
    assert band_gain(hi, mixed, 100.0) < 0.2


def test_1pole_repeat_attenuates_more():
    mixed = Audio.mix([sine(100.0, amp=0.3), sine(3000.0, amp=0.3)])
    one = mixed.filter_1pole_repeat_low(500.0, 1)
    four = mixed.filter_1pole_repeat_low(500.0, 4)
    assert band_gain(four, mixed, 3000.0) < band_gain(one, mixed, 3000.0)
    oneh = mixed.filter_1pole_repeat_high(500.0, 4)
    assert band_gain(oneh, mixed, 100.0) < 0.1


# --- modulation (reference AudioCombination.cpp, AudioFilter.cpp) ---------
def test_ring_modulate_sidebands():
    a = sine(500.0)
    b = sine(100.0)
    out = a.ring_modulate(b)
    # 500 * 100 -> 400 + 600 Hz sidebands, carrier suppressed
    assert band_gain(out, a, 400.0) > 0.15
    assert band_gain(out, a, 600.0) > 0.15
    assert band_gain(out, a, 500.0) < 0.05


def test_halfband_modulate_single_sideband():
    a = sine(500.0)
    # complex exponential modulator e^{2 pi i 100 t}: analytic-signal
    # multiply shifts 500 Hz to one sideband only
    mod = lambda t: (jnp.cos(2 * jnp.pi * 100.0 * t),
                     jnp.sin(2 * jnp.pi * 100.0 * t))
    out = a.halfband_modulate(mod)
    g_lo = band_gain(out, a, 400.0)
    g_hi = band_gain(out, a, 600.0)
    assert max(g_lo, g_hi) > 4 * min(g_lo, g_hi)


# --- envelopes / silence (reference AudioVolume.cpp, AudioTemporal.cpp) ---
def test_apply_ar_envelope():
    """Reference semantics (AudioVolume.cpp:304-321): AR = ADSR with zero
    decay/sustain, so the envelope spans only attack+release seconds and
    everything after is silent - it is NOT stretched to the clip."""
    x = Audio.create_from_array(np.ones((1, 4000), np.float32), SR)
    out = x.apply_ar_envelope(0.1, 0.1)
    d = np.asarray(out.data[0])
    assert d[10] < 0.1                       # attack starts quiet
    peak_i = int(0.1 * SR)
    assert d[peak_i] == pytest.approx(1.0, abs=0.05)  # attack peak
    assert d[int(0.15 * SR)] == pytest.approx(0.5, abs=0.15)  # mid-release
    assert np.abs(d[int(0.21 * SR):]).max() == 0.0    # silent past a+r


def test_remove_silence():
    t = np.arange(2000, dtype=np.float32) / SR
    loud = 0.5 * np.sin(2 * np.pi * 440 * t)
    x = np.concatenate([loud, np.zeros(4000, np.float32), loud])
    a = Audio.create_from_array(x[None], SR)
    out = a.remove_silence(0.05, 0.05)
    assert not out.is_null()
    assert out.num_frames < a.num_frames - 2000


def test_split_at_times_audio_and_pv():
    a = sine(seconds=1.0)
    pieces = a.split_at_times([0.25, 0.5])
    assert len(pieces) == 3
    # cut()'s documented end clamp (reference parity) loses one frame on
    # the final piece
    assert abs(sum(p.num_frames for p in pieces) - a.num_frames) <= 1
    pv = a.convert_to_PV(512, 64, 512)
    pv_pieces = pv.split_at_times([0.5])
    assert len(pv_pieces) == 2
    # cut_frames' reference end clamp (PV.cpp:652-653, golden-tested via
    # algo_pvjoin) drops the last frame of the final piece
    assert sum(p.num_frames for p in pv_pieces) == pv.num_frames - 1


# --- PV coverage -----------------------------------------------------------
def test_pv_modify_time_linear_map():
    """modify_time with a linear map scales duration and keeps the pitch
    (reference PVModify.cpp:364-369). Not frame-identical to stretch:
    stretch integrates factor (map = 1.5*(j+1)) while modify_time maps
    times directly (map = 1.5*j) - the reference's +1-frame offset."""
    pv = sine(440.0).convert_to_PV(512, 64, 512)
    mt = pv.modify_time(lambda t, f: 1.5 * t)
    assert mt.num_frames == pytest.approx(1.5 * pv.num_frames, abs=3)
    mid = mt.num_frames // 2
    mag = np.asarray(mt.mag[0, mid])
    freq = np.asarray(mt.freq[0, mid])
    peak = mag.argmax()
    assert abs(freq[peak] - 440.0) < 2.0


def test_pv_add_octaves():
    pv = sine(440.0).convert_to_PV(512, 64, 512)
    out = pv.add_octaves(1.0)
    mid = out.num_frames // 2
    m = np.asarray(out.mag[0, mid])
    b880 = int(880.0 / out.bin_width)
    assert m[b880 - 2:b880 + 3].max() > 0.1 * m.max()


def test_pv_accessors():
    pv = sine(440.0).convert_to_PV(512, 64, 512)
    assert pv.hop_size == 64
    assert pv.max_frequency == pytest.approx(SR / 2, rel=0.01)
    m, f = pv.get_MF(0, pv.num_frames // 2, int(440.0 / pv.bin_width))
    assert m > 0
    assert f == pytest.approx(440.0, abs=5.0)
    assert pv.get_max_partial_magnitude() > 0
    interp = pv.get_bin_interpolated(0, pv.num_frames // 2,
                                     440.0 / pv.bin_width)
    assert interp[1] == pytest.approx(440.0, abs=10.0)
    assert not pv.is_nan_or_inf()
    cp = pv.copy()
    np.testing.assert_array_equal(np.asarray(cp.mag), np.asarray(pv.mag))


# --- Audio accessors / constructors ---------------------------------------
def test_audio_accessors_and_constructors():
    a = sine(seconds=0.25)
    assert a.get_max_sample_magnitude() == pytest.approx(0.5, abs=0.01)
    assert a.frame_to_time(int(SR)) == pytest.approx(1.0)
    assert a.get_sample(0, 100) == pytest.approx(
        float(a.data[0, 100]), abs=1e-7)
    assert not a.is_nan_or_inf()
    assert a.to_numpy().shape == (1, a.num_frames)
    cp = a.copy()
    np.testing.assert_array_equal(np.asarray(cp.data), np.asarray(a.data))
    e = Audio.create_empty_with_length(0.5, num_channels=2, sample_rate=SR)
    assert e.num_frames == int(0.5 * SR) and e.num_channels == 2
    assert float(np.abs(np.asarray(e.data)).max()) == 0.0
    f = Audio.create_from_format(e.get_format())
    assert f.num_frames == e.num_frames


def test_in_place_aliases_match():
    a = sine(channels=2)
    np.testing.assert_array_equal(
        np.asarray(a.set_volume_in_place(0.25).data),
        np.asarray(a.set_volume(0.25).data))
    np.testing.assert_array_equal(
        np.asarray(a.pan_in_place(0.5).data), np.asarray(a.pan(0.5).data))
    np.testing.assert_array_equal(
        np.asarray(a.fade_in_place(0.05, 0.05).data),
        np.asarray(a.fade(0.05, 0.05).data))


def _chirp_tone(freq, seconds=1.0, drift=10.0):
    """YIN-trackable input: the reference's wavelength gate rejects
    perfectly PERIODIC signals (tests/test_information_spatial.py
    test_periodic_wavelength_quirk), so pitch tests need a drifting
    harmonic tone."""
    t = np.arange(int(seconds * SR), dtype=np.float32) / SR
    ph = 2 * np.pi * (freq * t + drift * t * t)
    x = 0.5 * (np.sin(ph) + 0.4 * np.sin(2 * ph + 0.7)
               + 0.15 * np.sin(3 * ph + 1.9))
    return Audio.create_from_array(x[None].astype(np.float32), SR)


def test_get_frequency_envelope_tracks_tone():
    a = _chirp_tone(330.0)
    env = a.get_frequency_envelope()
    v = float(np.asarray(env(jnp.float32(0.5))))
    # fundamental (~335-340 mid-clip with the drift) or its octave-down
    if v < 250.0:
        v *= 2.0
    assert v == pytest.approx(337.0, abs=25.0)


def test_get_local_wavelengths_and_frequency():
    a = _chirp_tone(400.0)
    wl = a.get_local_wavelengths(0, window_size=1024, hop=256)
    good = wl[wl > 0]
    assert good.size > 0
    # hops report ~1 or ~2 periods (octave errors are reference
    # behavior); fold to the fundamental before comparing
    folded = np.where(good > 1.5 * SR / 400.0, good / 2.0, good)
    assert np.median(folded) == pytest.approx(SR / 405.0, rel=0.07)
    f = a.get_local_frequency(0, start=int(0.5 * SR), window_size=1024)
    if f < 300.0:
        f *= 2.0
    assert f == pytest.approx(410.0, rel=0.07)


def test_ms_spv_and_sqpv_conversions():
    a = sine(440.0, seconds=0.25, channels=2)
    spv = a.convert_to_ms_SPV(64)
    assert not spv.is_null()
    assert spv.num_channels == 2
    # SQPV transforms are dormant upstream (AudioSQPV.cpp commented out)
    # but activated here; the ms variant must produce a mid/side SQPV
    sq = a.convert_to_ms_SQPV((55.0, 1760.0), 4)
    assert not sq.is_null() and sq.num_channels == 2


def test_synthesize_grains_direct():
    from flan_tpu.audio.synthesis import synthesize_grains
    grain = sine(440.0, seconds=0.05)
    out = synthesize_grains(0.5, 12.0, 0.0, lambda t: grain, SR, seed=2)
    assert not out.is_null()
    assert out.num_frames >= int(0.4 * SR)


def test_save_spectrum_to_bmp(tmp_path):
    p = str(tmp_path / "spec.bmp")
    sine(440.0).save_spectrum_to_bmp(p)
    assert open(p, "rb").read(2) == b"BM"


# --- SQPV pitch/Q math (reference SQPVBuffer.h/.cpp; algorithms dormant) --
def test_sqpv_pitch_math_roundtrips():
    from flan_tpu.sqpv.sqpv import SQPV
    sq = SQPV.create(1, 4, bins_per_octave=12.0, sample_rate=SR,
                     bandwidth=(55.0, 1760.0))
    assert sq.bandwidth == (55.0, 1760.0)
    # pitch <-> frequency <-> bin round trips
    for f in (55.0, 440.0, 1759.0):
        p = sq.frequency_to_pitch(f)
        assert sq.pitch_to_frequency(p) == pytest.approx(f, rel=1e-6)
        b = sq.pitch_to_bin(p)
        assert sq.bin_to_pitch(b) == pytest.approx(p, rel=1e-9)
    lo_p, hi_p = sq.pitch_bandwidth
    assert 2.0 ** lo_p == pytest.approx(55.0)
    assert 2.0 ** hi_p == pytest.approx(1760.0)
    # 5 octaves at 12 bins/octave
    assert SQPV.num_bins_for((55.0, 1760.0), 12.0) == 60
    freqs = sq.bin_frequencies()
    assert freqs[0] == pytest.approx(55.0, rel=0.01)
    assert np.all(np.diff(freqs) > 0)
    # Q cycles at the bin frequency, in frames
    assert sq.get_period(0) == int(np.ceil(sq.q / freqs[0] * SR))


# --- Wavetable range graphs / edit ops (reference Wavetable.cpp) ----------
def test_wavetable_range_graph_and_remove_jumps(tmp_path):
    from flan_tpu.wavetable import Wavetable
    t = np.arange(int(SR), dtype=np.float32) / SR
    a = Audio.create_from_array(
        (0.5 * np.sin(2 * np.pi * 125.0 * t))[None], SR)
    wt = Wavetable(a)
    assert wt.get_num_waveforms() > 2
    g = wt.graph_waveform_range(0, 0, 2)
    assert (g.to_uint8().max(axis=-1) > 100).sum() > 100
    p = str(tmp_path / "wt.bmp")
    wt.save_waveform_range_to_bmp(p, 0, 0, 2)
    assert open(p, "rb").read(2) == b"BM"
    # remove_jumps pins waveform edges toward their mean
    before = np.asarray(wt.table).copy()
    wt.remove_jumps_in_place(fade_frames=8)
    after = np.asarray(wt.table)
    edge_gap = np.abs(after[..., 0] - after[..., -1])
    edge_gap_before = np.abs(before[..., 0] - before[..., -1])
    assert edge_gap.mean() <= edge_gap_before.mean() + 1e-6
