"""WAV and .flan codec round-trip tests (reference formats:
AudioBuffer.cpp:70-190, PVBuffer.h:85-113)."""
import numpy as np
import pytest

from flan_tpu.core.audio_buffer import SndfileStrings
from flan_tpu.io.wav import read_wav, write_wav
from flan_tpu.io.flan_format import read_flan, write_flan


def test_wav_float32_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 1000)).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 48000)
    y, sr, _ = read_wav(p)
    assert sr == 48000
    np.testing.assert_array_equal(x, y)


@pytest.mark.parametrize("bits", [16, 24, 32])
def test_wav_pcm_roundtrip(tmp_path, bits):
    rng = np.random.default_rng(1)
    x = np.clip(rng.standard_normal((1, 500)).astype(np.float32) * 0.3,
                -1, 1)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 44100, bits=bits, float_format=False)
    y, sr, _ = read_wav(p)
    assert sr == 44100
    tol = 1.1 / (1 << (bits - 1))
    assert np.max(np.abs(x - y)) < tol


def test_wav_metadata_roundtrip(tmp_path):
    x = np.zeros((1, 10), np.float32)
    s = SndfileStrings(title="a song", artist="someone", comment="hi",
                       genre="noise")
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 48000, strings=s)
    _, _, s2 = read_wav(p)
    assert s2.title == "a song"
    assert s2.artist == "someone"
    assert s2.comment == "hi"
    assert s2.genre == "noise"


def test_flan_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    c, f, b = 2, 7, 129
    dft = 2 * (b - 1)
    mag = (rng.random((c, f, b)) * dft).astype(np.float32)
    freq = (rng.random((c, f, b)) * 20000).astype(np.float32)
    p = str(tmp_path / "t.flan")
    write_flan(p, mag, freq, 48000.0, 64, 256)
    m2, f2, sr, hop, win = read_flan(p)
    assert (sr, hop, win) == (48000.0, 64, 256)
    # 24-bit truncation (1 LSB) plus float32 rounding headroom
    assert np.max(np.abs(mag - m2)) <= dft / (1 << 23) * 2
    assert np.max(np.abs(freq - f2)) <= 48000 / (1 << 23) * 2


# --- AIFF / AIFF-C codec (io/aiff.py; reference reads every libsndfile
# format, AudioBuffer.cpp:86-117) --------------------------------------

def _aiff_sig(channels=2, n=977):
    rng = np.random.default_rng(5)
    return (0.8 * rng.standard_normal((channels, n))).clip(-1, 1) \
        .astype(np.float32)


def test_aiff_float_roundtrip_lossless(tmp_path):
    from flan_tpu.io.aiff import read_aiff, write_aiff
    x = _aiff_sig()
    p = str(tmp_path / "a.aiff")
    write_aiff(p, x, 44100.0)           # default: AIFF-C fl32
    y, sr = read_aiff(p)
    assert sr == 44100.0
    np.testing.assert_array_equal(y, x)
    blob = open(p, "rb").read()
    assert blob[:4] == b"FORM" and blob[8:12] == b"AIFC"


@pytest.mark.parametrize("bits,tol", [(8, 1 / 128), (16, 1 / 32768),
                                      (24, 1 / (1 << 23)),
                                      (32, 1 / (1 << 24))])
def test_aiff_pcm_roundtrip(tmp_path, bits, tol):
    from flan_tpu.io.aiff import read_aiff, write_aiff
    x = _aiff_sig(1)
    p = str(tmp_path / f"p{bits}.aif")
    write_aiff(p, x, 48000.0, bits=bits)
    y, sr = read_aiff(p)
    assert sr == 48000.0 and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=tol * 1.01)
    assert open(p, "rb").read()[8:12] == b"AIFF"


def test_aiff_sowt_little_endian(tmp_path):
    """'sowt' AIFF-C: 16-bit little-endian PCM (classic Mac variant)."""
    import struct
    from flan_tpu.io.aiff import _float_to_f80, read_aiff
    x = _aiff_sig(1, 400)
    q = np.clip(np.round(x.T * 32768.0), -32768, 32767).astype("<i2")
    comm = (struct.pack(">hIh", 1, 400, 16) + _float_to_f80(22050.0)
            + b"sowt" + b"\x00\x00")
    ssnd = struct.pack(">II", 0, 0) + q.tobytes()
    payload = (b"COMM" + struct.pack(">I", len(comm)) + comm
               + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    p = str(tmp_path / "s.aifc")
    with open(p, "wb") as f:
        f.write(b"FORM" + struct.pack(">I", 4 + len(payload)) + b"AIFC"
                + payload)
    y, sr = read_aiff(p)
    assert sr == 22050.0
    np.testing.assert_allclose(y, x, atol=1.01 / 32768)


def test_audio_aiff_dispatch(tmp_path):
    """Audio.save_to_file/.load_from_file route .aiff by extension/magic."""
    from flan_tpu import Audio
    import jax.numpy as jnp
    x = _aiff_sig()
    a = Audio(data=jnp.asarray(x), sample_rate=32000.0)
    p = str(tmp_path / "d.aif")
    a.save_to_file(p)
    b = Audio.load_from_file(p)
    assert b.sample_rate == 32000.0
    np.testing.assert_array_equal(np.asarray(b.data), x)


def test_aiff_rejects_garbage(tmp_path):
    from flan_tpu.io.aiff import read_aiff
    p = str(tmp_path / "g.aiff")
    open(p, "wb").write(b"not an aiff file at all.....")
    with pytest.raises(ValueError):
        read_aiff(p)


# --- Ogg/Vorbis via the system libvorbis (io/ogg.py) -------------------

def _ogg_available():
    from flan_tpu.io.ogg import available
    return available()


@pytest.mark.skipif(not _ogg_available(),
                    reason="system libvorbis not present")
def test_ogg_roundtrip_lossy(tmp_path):
    from flan_tpu.io.ogg import read_ogg, write_ogg
    sr = 44100.0
    t = np.arange(int(sr), dtype=np.float32) / sr
    x = np.stack([0.5 * np.sin(2 * np.pi * 440 * t),
                  0.5 * np.sin(2 * np.pi * 660 * t)]).astype(np.float32)
    p = str(tmp_path / "o.ogg")
    write_ogg(p, x, sr, 0.5)
    assert open(p, "rb").read(4) == b"OggS"
    y, sr2 = read_ogg(p)
    assert sr2 == sr and y.shape[0] == 2
    n, g = min(x.shape[1], y.shape[1]), 2048
    err = ((x[:, g:n - g] - y[:, g:n - g]) ** 2).mean()
    sig = (x[:, g:n - g] ** 2).mean()
    assert 10 * np.log10(sig / err) > 25.0   # lossy but faithful tones


@pytest.mark.skipif(not _ogg_available(),
                    reason="system libvorbis not present")
def test_audio_ogg_dispatch(tmp_path):
    from flan_tpu import Audio
    import jax.numpy as jnp
    sr = 48000.0
    t = np.arange(int(sr), dtype=np.float32) / sr
    a = Audio(data=jnp.asarray((0.4 * np.sin(2 * np.pi * 330 * t))[None]),
              sample_rate=sr)
    p = str(tmp_path / "d.ogg")
    a.save_to_file(p)
    b = Audio.load_from_file(p)
    assert b.sample_rate == sr and b.num_channels == 1
    assert abs(b.num_frames - a.num_frames) < 256


@pytest.mark.skipif(not _ogg_available(),
                    reason="system libvorbis not present")
def test_ogg_rejects_garbage(tmp_path):
    from flan_tpu.io.ogg import read_ogg
    p = str(tmp_path / "g.ogg")
    open(p, "wb").write(b"OggS" + b"\x00" * 64)
    with pytest.raises(ValueError):
        read_ogg(p)


# --- AU / CAF / Wave64 codecs (io/au.py, io/caf.py, io/w64.py; reference
# reads every libsndfile format, AudioBuffer.cpp:86-117) ----------------

def test_au_float_roundtrip_lossless(tmp_path):
    from flan_tpu.io.au import read_au, write_au
    x = _aiff_sig()
    p = str(tmp_path / "a.au")
    write_au(p, x, 44100.0)             # default: big-endian float32
    y, sr = read_au(p)
    assert sr == 44100.0
    np.testing.assert_array_equal(y, x)
    assert open(p, "rb").read()[:4] == b".snd"


@pytest.mark.parametrize("bits,tol", [(8, 1 / 128), (16, 1 / 32768),
                                      (24, 1 / (1 << 23)),
                                      (32, 1 / (1 << 24))])
def test_au_pcm_roundtrip(tmp_path, bits, tol):
    from flan_tpu.io.au import read_au, write_au
    x = _aiff_sig(1)
    p = str(tmp_path / f"p{bits}.au")
    write_au(p, x, 48000.0, bits=bits)
    y, sr = read_au(p)
    assert sr == 48000.0 and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=tol * 1.01)


def test_au_g711_table_endpoints(tmp_path):
    """G.711 decode vs ITU table values: mu-law 0x00 -> -32124,
    0xFF -> 0, 0x7F -> -0 band edge +32124 at 0x80; A-law 0xD5 -> +8,
    0x55 -> -8, 0xAA -> +... known pairs from the libsndfile tables."""
    import struct
    from flan_tpu.io.au import read_au

    def make(enc, payload, p):
        with open(p, "wb") as f:
            f.write(b".snd" + struct.pack(">IIIII", 24, len(payload),
                                          enc, 8000, 1) + payload)

    pu = str(tmp_path / "u.au")
    make(1, bytes([0x00, 0xFF, 0x80, 0x7F]), pu)
    yu, sr = read_au(pu)
    assert sr == 8000.0
    np.testing.assert_array_equal(
        np.round(yu[0] * 32768.0), [-32124.0, 0.0, 32124.0, -0.0])

    pa = str(tmp_path / "a.au")
    make(27, bytes([0xD5, 0x55, 0x80, 0x00]), pa)
    ya, _ = read_au(pa)
    # 0x80 ^ 0x55 = 0xD5: sign set, exp 5, mant 5 -> (0x158) << 4 = 5504
    # 0x00 ^ 0x55 = 0x55: sign 0, exp 5, mant 5 -> -5504
    np.testing.assert_array_equal(
        np.round(ya[0] * 32768.0), [8.0, -8.0, 5504.0, -5504.0])


def test_au_unknown_size_reads_to_eof(tmp_path):
    """data size 0xFFFFFFFF (the streaming convention) -> read to EOF."""
    import struct
    from flan_tpu.io.au import read_au
    q = np.array([1000, -1000, 32767], ">i2")
    p = str(tmp_path / "s.au")
    with open(p, "wb") as f:
        f.write(b".snd" + struct.pack(">IIIII", 24, 0xFFFFFFFF, 3,
                                      22050, 1) + q.tobytes())
    y, sr = read_au(p)
    assert sr == 22050.0 and y.shape == (1, 3)
    np.testing.assert_allclose(y[0] * 32768.0, q.astype(np.float32))


def test_caf_float_roundtrip_lossless(tmp_path):
    from flan_tpu.io.caf import read_caf, write_caf
    x = _aiff_sig()
    p = str(tmp_path / "a.caf")
    write_caf(p, x, 96000.0)            # default: LE float32 lpcm
    y, sr = read_caf(p)
    assert sr == 96000.0
    np.testing.assert_array_equal(y, x)
    assert open(p, "rb").read()[:4] == b"caff"


@pytest.mark.parametrize("bits,tol", [(16, 1 / 32768), (24, 1 / (1 << 23)),
                                      (32, 1 / (1 << 24))])
def test_caf_pcm_roundtrip(tmp_path, bits, tol):
    from flan_tpu.io.caf import read_caf, write_caf
    x = _aiff_sig(1)
    p = str(tmp_path / f"p{bits}.caf")
    write_caf(p, x, 48000.0, bits=bits)
    y, sr = read_caf(p)
    assert sr == 48000.0 and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=tol * 1.01)


def test_caf_big_endian_and_eof_data(tmp_path):
    """Hand-built BE int16 'lpcm' with data size -1 (to-EOF) and a
    skipped foreign chunk before it."""
    import struct
    from flan_tpu.io.caf import read_caf
    q = np.array([[300, -300], [20000, -20000]], ">i2")  # 2 frames, 2 ch
    desc = struct.pack(">d4sIIIII", 32000.0, b"lpcm", 0, 4, 1, 2, 16)
    p = str(tmp_path / "b.caf")
    with open(p, "wb") as f:
        f.write(b"caff" + struct.pack(">HH", 1, 0))
        f.write(b"desc" + struct.pack(">q", len(desc)) + desc)
        f.write(b"free" + struct.pack(">q", 6) + b"\x00" * 6)
        f.write(b"data" + struct.pack(">q", -1)
                + struct.pack(">I", 0) + q.tobytes())
    y, sr = read_caf(p)
    assert sr == 32000.0 and y.shape == (2, 2)
    np.testing.assert_allclose(
        y * 32768.0, q.astype(np.float32).T)


def test_w64_float_roundtrip_lossless(tmp_path):
    from flan_tpu.io.w64 import read_w64, write_w64
    x = _aiff_sig()
    p = str(tmp_path / "a.w64")
    write_w64(p, x, 44100.0)            # default: LE float32
    y, sr = read_w64(p)
    assert sr == 44100.0
    np.testing.assert_array_equal(y, x)
    blob = open(p, "rb").read()
    assert blob[:4] == b"riff" and blob[24:28] == b"wave"
    # the riff size field spans the whole file, header included
    import struct
    assert struct.unpack("<q", blob[16:24])[0] == len(blob)


@pytest.mark.parametrize("bits,tol", [(16, 1 / 32768), (24, 1 / (1 << 23)),
                                      (32, 1 / (1 << 24))])
def test_w64_pcm_roundtrip(tmp_path, bits, tol):
    from flan_tpu.io.w64 import read_w64, write_w64
    x = _aiff_sig(1)
    p = str(tmp_path / f"p{bits}.w64")
    write_w64(p, x, 48000.0, bits=bits)
    y, sr = read_w64(p)
    assert sr == 48000.0 and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=tol * 1.01)


def test_audio_au_caf_w64_dispatch(tmp_path):
    """save_to_file routes by extension; load_from_file by magic."""
    from flan_tpu import Audio
    import jax.numpy as jnp
    x = _aiff_sig()
    a = Audio(data=jnp.asarray(x), sample_rate=32000.0)
    for ext in ("au", "snd", "caf", "w64"):
        p = str(tmp_path / f"d.{ext}")
        a.save_to_file(p)
        b = Audio.load_from_file(p)
        assert b.sample_rate == 32000.0, ext
        np.testing.assert_array_equal(np.asarray(b.data), x)


def test_new_codecs_reject_garbage(tmp_path):
    from flan_tpu.io.au import read_au
    from flan_tpu.io.caf import read_caf
    from flan_tpu.io.w64 import read_w64
    for name, reader in (("g.au", read_au), ("g.caf", read_caf),
                         ("g.w64", read_w64)):
        p = str(tmp_path / name)
        open(p, "wb").write(b"garbage bytes, not audio at all....." * 3)
        with pytest.raises(ValueError):
            reader(p)


def test_caf_rejects_negative_chunk_size(tmp_path):
    """A malformed big-endian int64 chunk size <= -12 (not the -1 to-EOF
    sentinel) must error, not loop forever re-parsing the same chunk."""
    import struct
    from flan_tpu.io.caf import read_caf
    p = str(tmp_path / "n.caf")
    with open(p, "wb") as f:
        f.write(b"caff" + struct.pack(">HH", 1, 0))
        f.write(b"free" + struct.pack(">q", -12) + b"\x00" * 8)
    with pytest.raises(ValueError):
        read_caf(p)


# --- MP3 codec (io/mp3.py; system libmpg123/libmp3lame like the
# reference's external-codec boundary, AudioBuffer.cpp:86-117) ----------

def _mp3_available():
    from flan_tpu.io.mp3 import available
    return available()


@pytest.mark.skipif(not _mp3_available(),
                    reason="system mpg123/lame not present")
def test_mp3_roundtrip_gapless(tmp_path):
    """CBR encode -> decode: the LAME info tag makes the round trip
    SAMPLE-EXACT in length (codec delay/padding trimmed), and the lossy
    content stays faithful on tones."""
    from flan_tpu.io.mp3 import read_mp3, write_mp3
    sr = 32000.0
    t = np.arange(int(sr), dtype=np.float32) / sr
    x = np.stack([0.4 * np.sin(2 * np.pi * 440 * t),
                  0.4 * np.sin(2 * np.pi * 660 * t)]).astype(np.float32)
    p = str(tmp_path / "a.mp3")
    write_mp3(p, x, sr)
    y, sr2 = read_mp3(p)
    assert sr2 == sr and y.shape == x.shape
    for c in range(2):
        err = ((y[c, 4000:28000] - x[c, 4000:28000]) ** 2).mean()
        sig = (x[c, 4000:28000] ** 2).mean()
        assert 10 * np.log10(sig / err) > 20.0, c


@pytest.mark.skipif(not _mp3_available(),
                    reason="system mpg123/lame not present")
def test_audio_mp3_dispatch(tmp_path):
    """save_to_file routes .mp3; load_from_file sniffs the frame sync
    (and ID3) magic."""
    from flan_tpu import Audio
    import jax.numpy as jnp
    sr = 32000.0
    t = np.arange(int(0.5 * sr), dtype=np.float32) / sr
    a = Audio(data=jnp.asarray((0.4 * np.sin(2 * np.pi * 330 * t))[None]),
              sample_rate=sr)
    p = str(tmp_path / "d.mp3")
    a.save_to_file(p)
    b = Audio.load_from_file(p)
    assert b.sample_rate == sr and b.num_channels == 1
    assert b.num_frames == a.num_frames    # gapless


@pytest.mark.skipif(not _mp3_available(),
                    reason="system mpg123/lame not present")
def test_mp3_rejects_garbage_and_too_many_channels(tmp_path):
    from flan_tpu.io.mp3 import read_mp3, write_mp3
    p = str(tmp_path / "g.mp3")
    open(p, "wb").write(b"\x00garbage, not mpeg frames at all....." * 4)
    with pytest.raises(ValueError):
        read_mp3(p)
    with pytest.raises(ValueError):
        write_mp3(str(tmp_path / "x.mp3"),
                  np.zeros((3, 100), np.float32), 32000.0)
