"""PV selection/generation/extras tests (reference PV.cpp, PVModify.cpp)."""
import numpy as np
import pytest

from flan_tpu import Audio, PV

SR = 8000.0
WINDOW, HOP, DFT = 512, 64, 512


@pytest.fixture(scope="module")
def sine_pv():
    t = np.arange(int(0.5 * SR), dtype=np.float32) / SR
    a = Audio.create_from_array(
        (0.5 * np.sin(2 * np.pi * 440 * t))[None], SR)
    return a.convert_to_PV(WINDOW, HOP, DFT)


def test_freeze(sine_pv):
    fr = sine_pv.freeze([0.25], [0.1])
    extra = int(sine_pv.time_to_frame(0.1))
    assert fr.num_frames == sine_pv.num_frames + extra
    # frozen section repeats the frame at 0.25s
    f0 = int(sine_pv.time_to_frame(0.25))
    np.testing.assert_array_equal(np.asarray(fr.mag[:, f0]),
                                  np.asarray(fr.mag[:, f0 + extra // 2]))


def test_select_identity(sine_pv):
    sel = sine_pv.select(
        sine_pv.length / 2,
        lambda t, f: (t, f))
    assert sel.num_frames == int(sine_pv.num_frames / 2)
    # identity selector reproduces the source (away from top bin edge)
    np.testing.assert_allclose(
        np.asarray(sel.mag[0, 10, :-1]),
        np.asarray(sine_pv.mag[0, 10, :-1]), atol=1e-4)


def test_retain_n_loudest(sine_pv):
    kept = sine_pv.retain_n_loudest_partials(3)
    mags = np.asarray(kept.mag[0])
    assert ((mags > 0).sum(axis=-1) <= 3).all()
    # the peak bin survives
    mid = sine_pv.num_frames // 2
    peak = np.asarray(sine_pv.mag[0, mid]).argmax()
    assert mags[mid, peak] > 0


def test_remove_n_loudest(sine_pv):
    removed = sine_pv.remove_n_loudest_partials(3)
    mid = sine_pv.num_frames // 2
    peak = np.asarray(sine_pv.mag[0, mid]).argmax()
    assert np.asarray(removed.mag[0, mid])[peak] == 0.0


def test_replace_amplitudes(sine_pv):
    other = sine_pv._with(mag=sine_pv.mag * 2.0, freq=sine_pv.freq)
    rep = sine_pv.replace_amplitudes(other, 1.0)
    np.testing.assert_allclose(np.asarray(rep.mag), np.asarray(other.mag),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(rep.freq),
                               np.asarray(sine_pv.freq), atol=1e-4)


def test_subtract_amplitudes(sine_pv):
    sub = sine_pv.subtract_amplitudes(sine_pv, 1.0)
    np.testing.assert_allclose(np.asarray(sub.mag), 0.0, atol=1e-4)


def test_resonate(sine_pv):
    res = sine_pv.resonate(0.25, 0.5)
    assert res.num_frames > sine_pv.num_frames
    mid = sine_pv.num_frames // 2
    peak = np.asarray(sine_pv.mag[0, mid]).argmax()
    tail = np.asarray(res.mag[0, sine_pv.num_frames + 5])
    assert tail[peak] > 0  # decayed energy persists past the input end
    # and decays over time
    tail2 = np.asarray(res.mag[0, res.num_frames - 1])
    assert tail2[peak] < tail[peak]


def test_shape_identity_and_scale(sine_pv):
    ident = sine_pv.shape(lambda m, f: (m, f))
    np.testing.assert_allclose(np.asarray(ident.mag),
                               np.asarray(sine_pv.mag), atol=1e-5)
    quieter = sine_pv.shape(lambda m, f: (m * 0.5, f))
    np.testing.assert_allclose(np.asarray(quieter.mag),
                               np.asarray(sine_pv.mag) * 0.5, atol=1e-5)


def test_add_harmonics(sine_pv):
    added = sine_pv.add_harmonics(lambda t, h: 0.5)
    mid = sine_pv.num_frames // 2
    m = np.asarray(added.mag[0, mid])
    fr = np.asarray(added.freq[0, mid])
    # energy should appear near 880 Hz (2nd harmonic)
    b880 = int(880.0 / sine_pv.bin_width)
    assert m[b880 - 2:b880 + 3].max() > 0
    peak = m[b880 - 2:b880 + 3].argmax() + b880 - 2
    assert abs(fr[peak] - 880.0) < 20.0


def test_desample(sine_pv):
    de = sine_pv.desample(0.25)
    assert de.num_frames == sine_pv.num_frames
    # magnitude profile roughly preserved at selected points
    mid = sine_pv.num_frames // 2
    peak = np.asarray(sine_pv.mag[0, mid]).argmax()
    assert np.asarray(de.mag[0, mid])[peak] > 0


def test_stretch_spline(sine_pv):
    st = sine_pv.stretch_spline(2.0)
    assert st.num_frames == pytest.approx(2 * sine_pv.num_frames, abs=4)
    mid = st.num_frames // 2
    f = np.asarray(st.freq[0, mid])[np.asarray(st.mag[0, mid]).argmax()]
    assert abs(f - 440.0) < 10.0


def test_time_extrapolate(sine_pv):
    ext = sine_pv.time_extrapolate(0.1, 0.3, 0.2)
    assert ext.num_frames == int(sine_pv.time_to_frame(0.3)) + int(
        sine_pv.time_to_frame(0.2))
    assert np.isfinite(np.asarray(ext.mag)).all()


def test_pv_synthesize():
    pv = PV.synthesize(0.1, 220.0)
    assert not pv.is_null()
    mid = pv.num_frames // 2
    m = np.asarray(pv.mag[0, mid])
    b220 = int(220.0 / pv.bin_width)
    assert m[b220 - 3:b220 + 4].max() > 0


def test_smear_time(sine_pv):
    sm = sine_pv.smear_time(0.05, granularity=2)
    assert sm.num_frames >= sine_pv.num_frames
    assert np.isfinite(np.asarray(sm.mag)).all()


def test_general_modify_matches_stretch(sine_pv):
    """modify with a pure time map approximates stretch."""
    mod = sine_pv.modify(lambda t, f: (t * 2.0, f), max_quad_span=4)
    assert mod.num_frames == pytest.approx(2 * sine_pv.num_frames, abs=4)
    mid = mod.num_frames // 2
    m = np.asarray(mod.mag[0, mid])
    fr = np.asarray(mod.freq[0, mid])
    assert abs(fr[m.argmax()] - 440.0) < 10.0


def test_add_harmonics_pass_count_bounded(sine_pv):
    """The harmonic count is exactly num_bins like the reference
    (PV.cpp:418, golden-tested in test_algo_golden.py), so a junk
    near-zero-frequency bin cannot drive thousands of full-plane scatter
    passes (round-2 review finding 5); max_harmonics lowers it further."""
    pv = sine_pv
    freq = pv.freq.at[0, 2, 3].set(1.5)   # junk partial at 1.5 Hz
    mag = pv.mag.at[0, 2, 3].set(0.1)
    pv = pv._with(freq=freq, mag=mag)
    out = pv.add_harmonics(1.0, max_harmonics=32)
    assert not out.is_null()
    full = pv.add_harmonics(1.0)
    assert not full.is_null()


def test_harmonic_series_per_bin_rejected(sine_pv):
    """Series functions are scalar over (time, harmonic) like the
    reference's Function<pair<Second, Harmonic>, Magnitude>; per-bin
    returns raise a clear error instead of a broadcast crash."""
    import pytest
    import jax.numpy as jnp
    pv = sine_pv
    b = pv.num_bins
    with pytest.raises(ValueError, match="per-bin"):
        pv.add_harmonics(lambda t, h: jnp.ones((t.shape[0], b)),
                         max_harmonics=4)
