"""Second-pass coverage: helpers and remaining method variants."""
import numpy as np
import pytest

import jax.numpy as jnp

from flan_tpu import Audio

SR = 8000.0


def sine(freq=440.0, seconds=0.5, amp=0.5):
    t = np.arange(int(seconds * SR), dtype=np.float32) / SR
    return Audio.create_from_array(
        (amp * np.sin(2 * np.pi * freq * t))[None], SR)


def test_frequency_response_helper():
    from flan_tpu.utils.testing import frequency_response_1d
    g = frequency_response_1d(
        lambda a: a.filter_1pole_lowpass(500.0, 1), SR,
        [250.0, 500.0, 1000.0])
    expected = [1 / np.sqrt(1 + (f / 500.0) ** 2)
                for f in (250.0, 500.0, 1000.0)]
    np.testing.assert_allclose(g, expected, rtol=0.06)


def test_get_average_wavelength():
    # drifting harmonic tone: the reference's YIN gate rejects perfectly
    # periodic inputs (test_information_spatial.test_periodic_wavelength_quirk)
    t = np.arange(int(SR), dtype=np.float32) / SR
    ph = 2 * np.pi * (200.0 * t + 10.0 * t * t)
    x = 0.5 * (np.sin(ph) + 0.4 * np.sin(2 * ph + 0.7)
               + 0.15 * np.sin(3 * ph + 1.9))
    a = Audio.create_from_array(x[None].astype(np.float32), SR)
    avg = a.get_average_wavelength(0, 0.2, 64.0, 0, -1, 1024, 256)
    assert avg == pytest.approx(39.0, abs=2.0)  # ~205 Hz mid-clip
    silent = Audio.create_from_array(np.zeros((1, 4000), np.float32), SR)
    assert silent.get_average_wavelength(0) in (-1.0, 0.0, -1)


def test_spv_modify_frequency_callable():
    a = sine(440.0, seconds=0.25)
    spv = a.convert_to_SPV(64)
    shifted = spv.modify_frequency(lambda t, f: f + 100.0)
    mid = spv.num_frames // 2
    m = np.asarray(shifted.mag[0, mid])
    f = np.asarray(shifted.freq[0, mid])
    assert abs(f[m.argmax()] - 540.0) < 20.0


def test_split_with_lengths_and_fades():
    a = sine(seconds=1.0)
    parts = a.split_with_lengths([0.25, 0.25, 0.5], fade=0.01)
    assert len(parts) == 3
    assert parts[0].num_frames == pytest.approx(0.25 * SR, abs=2)


def test_pv_save_bmp(tmp_path):
    pv = sine().convert_to_PV(256, 64, 256)
    p = str(tmp_path / "s.bmp")
    pv.save_to_bmp(p)
    assert open(p, "rb").read(2) == b"BM"


def test_audio_graph_timeline(tmp_path):
    a = sine(seconds=0.5)
    g = a.convert_to_graph(timeline_scale=6.0)
    assert g.to_uint8().max() > 0


def test_mesh_helpers():
    import jax
    from flan_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                        seq_sharding)
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    bs = batch_sharding(mesh)
    ss = seq_sharding(mesh)
    x = jax.device_put(jnp.zeros((8, 4)), bs)
    y = jax.device_put(jnp.zeros((2, 64)), ss)
    assert x.sharding.is_equivalent_to(bs, 2)
    assert y.sharding.is_equivalent_to(ss, 2)


def test_sndfile_strings_defaults():
    from flan_tpu import SndfileStrings
    s = SndfileStrings(title="x")
    assert s.title == "x" and s.genre == ""


def test_buffer_summaries(capsys):
    sine(seconds=0.1).print_summary()
    sine(seconds=0.1).convert_to_PV(256, 64, 256).print_summary()
    out = capsys.readouterr().out
    assert "Audio:" in out and "PV:" in out
