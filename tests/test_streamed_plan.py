"""Dispatch tests for the streamed harness's host-side remap plan:
static-row detection for constant-rate maps, dynamic fallback for
variable maps, and channel-adaptive chunk selection."""
import numpy as np
import jax.numpy as jnp
import pytest

import flan_tpu.pipelines.streamed as st
from flan_tpu.pipelines import pv_repitch_pipeline, pv_stretch_pipeline

SR = 8000.0


@pytest.fixture
def spy(monkeypatch):
    seen = {}
    orig = st._streamed_scan

    def wrapper(*a, **k):
        seen["static"] = k.get("li_row") is not None
        seen["chunk_out"] = k.get("chunk_out")
        return orig(*a, **k)

    monkeypatch.setattr(st, "_streamed_scan", wrapper)
    return seen


def _x(channels=2, n=4000):
    rng = np.random.default_rng(0)
    return jnp.asarray(
        (rng.standard_normal((channels, n)) * 0.3).astype(np.float32))


def test_constant_factor_takes_static_rows(spy):
    pv_stretch_pipeline(_x(), 2.0, window_size=512, hop=64, dft_size=512,
                        sample_rate=SR)
    assert spy["static"]


def test_identity_map_takes_static_rows(spy):
    pv_repitch_pipeline(_x(), 1.5, window_size=512, hop=64, dft_size=512,
                        sample_rate=SR)
    assert spy["static"]


def test_incommensurate_factor_falls_back_dynamic(spy):
    # stride 256/1.5 is fractional: per-chunk patterns alternate phases
    # (needs multiple chunks; a single chunk is trivially uniform)
    pv_stretch_pipeline(_x(n=40000), 1.5, window_size=512, hop=64,
                        dft_size=512, sample_rate=SR, chunk_out=256)
    assert not spy["static"]


def test_chunk_adapts_to_channel_count(spy):
    # long enough that the output exceeds both chunk candidates
    pv_stretch_pipeline(_x(channels=2, n=40000), 2.0, window_size=512,
                        hop=64, dft_size=512, sample_rate=SR)
    assert spy["chunk_out"] == 256
    pv_stretch_pipeline(_x(channels=16, n=40000), 2.0, window_size=512,
                        hop=64, dft_size=512, sample_rate=SR)
    assert spy["chunk_out"] == 128
