"""Sequence-parallel STFT vs single-chip, on the 8-device virtual mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flan_tpu.ops import stft
from flan_tpu.parallel.mesh import make_mesh
from flan_tpu.parallel.stft_sp import pv_forward_sp, pv_inverse_sp

SR = 8000.0
WINDOW, HOP, DFT = 256, 64, 256


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8, axis_name="sp")


def test_forward_sp_matches_single(mesh):
    rng = np.random.default_rng(0)
    n = 8 * 64 * HOP  # 8 shards of 64 hops
    x = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32) * 0.3)
    mag1, freq1 = stft.pv_forward(x, window_size=WINDOW, hop=HOP,
                                  dft_size=DFT, sample_rate=SR)
    mag8, freq8 = pv_forward_sp(x, mesh, window_size=WINDOW, hop=HOP,
                                dft_size=DFT, sample_rate=SR)
    nh = mag1.shape[1]
    np.testing.assert_allclose(np.asarray(mag8[:, :nh]),
                               np.asarray(mag1), atol=1e-3)
    np.testing.assert_allclose(np.asarray(freq8[:, :nh]),
                               np.asarray(freq1), atol=0.5)


def test_inverse_sp_matches_single(mesh):
    rng = np.random.default_rng(1)
    n = 8 * 64 * HOP
    t = np.arange(n, dtype=np.float32) / SR
    x = jnp.asarray((0.5 * np.sin(2 * np.pi * 440 * t))[None])
    mag, freq = pv_forward_sp(x, mesh, window_size=WINDOW, hop=HOP,
                              dft_size=DFT, sample_rate=SR)
    y1 = stft.pv_inverse(mag, freq, window_size=WINDOW, hop=HOP,
                         sample_rate=SR)
    y8 = pv_inverse_sp(mag, freq, mesh, window_size=WINDOW, hop=HOP,
                       sample_rate=SR)
    np.testing.assert_allclose(np.asarray(y8), np.asarray(y1), atol=2e-3)


def test_sp_roundtrip_reconstructs(mesh):
    n = 8 * 64 * HOP
    t = np.arange(n, dtype=np.float32) / SR
    x = jnp.asarray((0.5 * np.sin(2 * np.pi * 330 * t))[None])
    mag, freq = pv_forward_sp(x, mesh, window_size=WINDOW, hop=HOP,
                              dft_size=DFT, sample_rate=SR)
    y = pv_inverse_sp(mag, freq, mesh, window_size=WINDOW, hop=HOP,
                      sample_rate=SR)
    guard = WINDOW * 2
    a = np.asarray(x[0, guard:n - guard])
    b = np.asarray(y[0, guard:n - guard])
    rel = np.sqrt(((a - b) ** 2).mean()) / np.sqrt((a ** 2).mean())
    assert rel < 0.05
