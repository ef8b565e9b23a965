"""Fused streaming stretch pipeline vs the unfused path."""
import numpy as np
import pytest

from flan_tpu import Audio
from flan_tpu.pipelines import pv_stretch_pipeline

SR = 8000.0
WINDOW, HOP, DFT = 256, 64, 256


def test_fused_matches_unfused():
    rng = np.random.default_rng(0)
    t = np.arange(4000, dtype=np.float32) / SR
    x = np.stack([0.5 * np.sin(2 * np.pi * 440 * t),
                  0.3 * np.sin(2 * np.pi * 220 * t)]).astype(np.float32)
    a = Audio.create_from_array(x, SR)
    unfused = a.convert_to_PV(WINDOW, HOP, DFT).stretch(
        2.0).convert_to_audio()
    fused = pv_stretch_pipeline(
        a.data, 2.0, window_size=WINDOW, hop=HOP, dft_size=DFT,
        sample_rate=SR, chunk_out=32)
    uf = np.asarray(unfused.data)
    fu = np.asarray(fused)
    n = min(uf.shape[-1], fu.shape[-1])
    np.testing.assert_allclose(fu[:, :n], uf[:, :n], atol=2e-4)


def test_fused_variable_factor():
    t = np.arange(2000, dtype=np.float32) / SR
    x = (0.5 * np.sin(2 * np.pi * 330 * t))[None].astype(np.float32)
    a = Audio.create_from_array(x, SR)
    factor = lambda tt: 1.0 + 0.5 * tt  # accelerating stretch
    unfused = a.convert_to_PV(WINDOW, HOP, DFT).stretch(
        lambda tt, f: 1.0 + 0.5 * tt).convert_to_audio()
    fused = pv_stretch_pipeline(
        x, factor, window_size=WINDOW, hop=HOP, dft_size=DFT,
        sample_rate=SR, chunk_out=16)
    uf = np.asarray(unfused.data)
    fu = np.asarray(fused)
    n = min(uf.shape[-1], fu.shape[-1])
    np.testing.assert_allclose(fu[:, :n], uf[:, :n], atol=2e-4)
