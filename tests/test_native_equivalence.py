"""Fuzz equivalence: the C++ fast paths (flan_tpu/native) must be
byte/bit-identical to the numpy fallbacks for every codec - the
docstrings claim it (io/wav.py:106, io/flan_format.py:43), these tests
enforce it on randomized inputs including clamp edges and exact
quantization boundaries."""
import numpy as np
import pytest

from flan_tpu import native

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="no native toolchain")


def _force_fallback(monkeypatch):
    for fn in ("decode_pcm", "encode_pcm", "pack_mf24", "unpack_mf24",
               "encode_bmp_rows"):
        monkeypatch.setattr(native, fn, lambda *a, **k: None)


def _signals():
    rng = np.random.default_rng(7)
    yield rng.standard_normal((2, 997)).astype(np.float32) * 0.5
    # clamp edges, exact boundaries, tiny values
    yield np.array([[1.0, -1.0, 2.5, -2.5, 0.0, 1e-8, -1e-8,
                     0.5, -0.5, 1.0 - 2 ** -24]], np.float32)
    yield (rng.standard_normal((3, 256)) * 1.5).astype(np.float32)


@pytest.mark.parametrize("bits", [16, 24, 32, "f32"])
def test_encode_pcm_matches_fallback(monkeypatch, bits):
    from flan_tpu.io import wav as wavmod
    tag = (wavmod.WAVE_FORMAT_IEEE_FLOAT if bits == "f32"
           else wavmod.WAVE_FORMAT_PCM)
    b = 32 if bits == "f32" else bits
    for sig in _signals():
        fast = wavmod._encode_samples(sig, tag, b)
        with pytest.MonkeyPatch.context() as mp:
            _force_fallback(mp)
            slow = wavmod._encode_samples(sig, tag, b)
        assert fast == slow, f"encode mismatch at bits={bits}"


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_decode_pcm_matches_fallback(monkeypatch, bits):
    from flan_tpu.io import wav as wavmod
    rng = np.random.default_rng(bits)
    raw = rng.integers(0, 256, size=2 * 501 * (bits // 8 if bits > 8 else 1),
                       dtype=np.uint8).tobytes()
    fast = wavmod._decode_samples(raw, wavmod.WAVE_FORMAT_PCM, bits, 2)
    with pytest.MonkeyPatch.context() as mp:
        _force_fallback(mp)
        slow = wavmod._decode_samples(raw, wavmod.WAVE_FORMAT_PCM, bits, 2)
    np.testing.assert_array_equal(fast, slow)


@pytest.mark.parametrize("kind", ["f32", "f64"])
def test_decode_float_matches_fallback(monkeypatch, kind):
    from flan_tpu.io import wav as wavmod
    rng = np.random.default_rng(3)
    vals = rng.standard_normal(2 * 333).astype(
        np.float32 if kind == "f32" else np.float64)
    fast = wavmod._decode_samples(vals.tobytes(),
                                  wavmod.WAVE_FORMAT_IEEE_FLOAT,
                                  32 if kind == "f32" else 64, 2)
    with pytest.MonkeyPatch.context() as mp:
        _force_fallback(mp)
        slow = wavmod._decode_samples(vals.tobytes(),
                                      wavmod.WAVE_FORMAT_IEEE_FLOAT,
                                      32 if kind == "f32" else 64, 2)
    np.testing.assert_array_equal(fast, slow)


def test_flan_file_bytes_match_fallback(monkeypatch, tmp_path):
    from flan_tpu.io import flan_format
    rng = np.random.default_rng(11)
    mag = (rng.random((2, 7, 257)) * 3000).astype(np.float32)
    freq = (rng.standard_normal((2, 7, 257)) * 8000).astype(np.float32)
    # out-of-range values exercise the clamp; exact 0 the truncation
    mag[0, 0, :4] = [0.0, 1e6, -1e6, 512.0]
    p_fast, p_slow = str(tmp_path / "f.flan"), str(tmp_path / "s.flan")
    flan_format.write_flan(p_fast, mag, freq, 8000.0, 64, 512)
    with pytest.MonkeyPatch.context() as mp:
        _force_fallback(mp)
        flan_format.write_flan(p_slow, mag, freq, 8000.0, 64, 512)
    fast_bytes = open(p_fast, "rb").read()
    assert fast_bytes == open(p_slow, "rb").read()

    # loader parity: native unpack == fallback unpack, bit for bit
    m1, f1, *_ = flan_format.read_flan(p_fast)
    with pytest.MonkeyPatch.context() as mp:
        _force_fallback(mp)
        m2, f2, *_ = flan_format.read_flan(p_fast)
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(f1, f2)


def test_bmp_bytes_match_fallback(monkeypatch, tmp_path):
    from flan_tpu.graph.graph import write_bmp
    rng = np.random.default_rng(5)
    for w in (33, 64):  # 33 exercises row padding to 4 bytes
        rgb = rng.integers(0, 256, size=(17, w, 3), dtype=np.uint8)
        p_fast, p_slow = str(tmp_path / "a.bmp"), str(tmp_path / "b.bmp")
        write_bmp(p_fast, rgb)
        with pytest.MonkeyPatch.context() as mp:
            _force_fallback(mp)
            write_bmp(p_slow, rgb)
        assert open(p_fast, "rb").read() == open(p_slow, "rb").read()
