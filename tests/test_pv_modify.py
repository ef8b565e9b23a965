"""PV stretch / repitch / modify tests (reference PVModify.cpp).

Assertions stay in the PV domain where possible: each distinct output shape
fed to convert_to_audio costs a fresh XLA compile on the 1-core test CPU.
"""
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


def peak_bin_freq(pv, frame):
    mag = np.asarray(pv.mag[0, frame])
    freq = np.asarray(pv.freq[0, frame])
    return freq[mag.argmax()]


def test_stretch_length(sine_pv):
    st = sine_pv.stretch(2.0)
    assert st.num_frames == pytest.approx(2 * sine_pv.num_frames, abs=2)
    assert st.num_bins == sine_pv.num_bins


def test_stretch_preserves_frequency_content(sine_pv):
    st = sine_pv.stretch(2.0)
    f = peak_bin_freq(st, st.num_frames // 2)
    assert abs(f - 440) < 5


def test_stretch_magnitude_preserved(sine_pv):
    """Stretching doesn't change per-frame magnitudes away from edges
    (WFS policy, PVModify.cpp:344-355)."""
    st = sine_pv.stretch(2.0)
    mid_in = np.asarray(sine_pv.mag[0, sine_pv.num_frames // 2])
    mid_out = np.asarray(st.mag[0, st.num_frames // 2])
    assert mid_out.max() == pytest.approx(mid_in.max(), rel=0.05)


def test_repitch_shifts_pitch(sine_pv):
    rp = sine_pv.repitch(1.5)
    f = peak_bin_freq(rp, rp.num_frames // 2)
    # The reference's bin integral starts at factor*1 bin, giving an
    # inherent +factor*bin_width offset (PVModify.cpp:278-284), preserved
    # here for parity.
    expected = 660 + 1.5 * sine_pv.bin_width
    assert abs(f - expected) < 2 * sine_pv.bin_width


def test_stretch_variable_factor(sine_pv):
    """Stretch with a lambda factor integrates it
    (reference PVModify.cpp:371-385)."""
    st = sine_pv.stretch(lambda t, f: 1.5 + 0.0 * t)
    assert st.num_frames == pytest.approx(1.5 * sine_pv.num_frames, abs=3)


def test_cut_and_join(sine_pv):
    a = sine_pv.cut_frames(0, 10)
    b = sine_pv.cut_frames(10, sine_pv.num_frames)
    j = PV.join([a, b])
    # reference quirk (PV.cpp:653-654, golden algo_pvjoin): cut_frames
    # clamps END to num_frames - 1, so the last frame is never cut and
    # the round trip is one frame short
    assert j.num_frames == sine_pv.num_frames - 1
    np.testing.assert_array_equal(
        np.asarray(j.mag), np.asarray(sine_pv.mag)[:, :-1])


def test_get_frame(sine_pv):
    fr = sine_pv.get_frame(0.25)
    assert fr.num_frames == 1
    assert fr.num_bins == sine_pv.num_bins


def test_repitch_const_fast_path_matches_general(sine_pv):
    """PV.repitch(const) takes the host-precomputed static-gather path;
    it must match the general cumsum + searchsorted path."""
    import jax.numpy as jnp
    from flan_tpu.ops import pv_modify
    pv = sine_pv
    fast = pv.repitch(1.5)
    # general path: same math via the traced-function route
    slow = pv.repitch(lambda t, f: 1.5 + 0.0 * t)
    np.testing.assert_allclose(np.asarray(fast.mag), np.asarray(slow.mag),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(fast.freq), np.asarray(slow.freq),
                               atol=0.25)  # boundary-bin ties may differ
