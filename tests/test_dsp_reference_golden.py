"""DSPUtility + defines goldens against the COMPILED reference
(tools/reference_oracle/gen_fixtures.cpp DSP section; fixtures are the
output of the reference's own DSPUtility.cpp:37-190 and defines.cpp:5-6)."""
import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "fixtures", "reference")


def _f32(name):
    return np.fromfile(os.path.join(FIX, name), np.float32)


QUADS = [(0.5, 1.0, 0.25, 7), (1.0, 1.0, 0.999999, 3),
         (-2.0, 0.5, -1.0, 0), (0.1, 0.9, 0.85, 100), (3.0, 3.5, 3.25, 55)]


def test_parabolic_interpolation_matches_reference():
    from flan_tpu.ops.dsp_utility import parabolic_interpolation
    gold = _f32("dsp_parabolic.f32").reshape(-1, 2)
    for (y0, y1, y2, x1), (gx, gy) in zip(QUADS, gold):
        x, y = parabolic_interpolation(
            np.float32(y0), np.float32(y1), np.float32(y2), x1)
        # reference computes in f32; ours in f32/f64 - compare at f32 tol
        np.testing.assert_allclose(float(x), gx, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(float(y), gy, rtol=1e-5, atol=1e-5)


def test_db_amp_matches_reference():
    from flan_tpu.core.types import (amplitude_to_decibel,
                                     decibel_to_amplitude)
    gold = _f32("dsp_db_amp.f32")
    dbs = np.arange(-120, 41, 7, dtype=np.float32)
    amps = np.array([1e-6, 0.001, 0.5, 1.0, 2.0, 31.623], np.float32)
    got = np.concatenate([
        np.asarray([float(decibel_to_amplitude(d)) for d in dbs]),
        np.asarray([float(amplitude_to_decibel(a)) for a in amps]),
    ]).astype(np.float32)
    np.testing.assert_allclose(got, gold, rtol=2e-6)


@pytest.mark.parametrize("interp", [False, True])
def test_find_peaks_valleys_match_reference(interp):
    from flan_tpu.ops.dsp_utility import find_peaks, find_valleys
    bumpy = _f32("dsp_bumpy.f32")
    sfx = "_interp" if interp else "_raw"
    gold_p = _f32("dsp_peaks" + sfx + ".f32").reshape(-1, 2)
    gold_v = _f32("dsp_valleys" + sfx + ".f32").reshape(-1, 2)
    ours_p = find_peaks(bumpy, interpolate=interp)
    ours_v = find_valleys(bumpy, interpolate=interp)
    # order: reference emits in ascending frame order when ampOrder=false
    np.testing.assert_allclose(ours_p, gold_p, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(ours_v, gold_v, rtol=1e-5, atol=1e-4)


def test_mean_and_sd_matches_reference():
    from flan_tpu.ops.dsp_utility import mean_and_sd
    bumpy = _f32("dsp_bumpy.f32")
    gold = _f32("dsp_mean_sd.f32")
    m, s = mean_and_sd(bumpy)
    np.testing.assert_allclose([m, s], gold, rtol=1e-5, atol=1e-6)
