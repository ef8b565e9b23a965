"""FLAC codec tests: encoder round trips plus hand-built bitstreams for
the decode-only paths (LPC, stereo decorrelation, rice2/escape
partitions, wasted bits) the minimal encoder never emits.

Reference behavior being matched: AudioBuffer load dispatch
(src/flan/Audio/AudioBuffer.cpp:86-117 loads any libsndfile format;
FLAC is the compressed one its docs use)."""
import struct

import numpy as np
import pytest

from flan_tpu.io import flac
from flan_tpu.io.flac import (_BitWriter, _crc8, _crc16, _utf8_number,
                              read_flac, write_flac)


def _quantize(x, bits=16):
    full = float(1 << (bits - 1))
    return np.clip(np.rint(np.asarray(x, np.float64) * full),
                   -full, full - 1).astype(np.int64)


def _roundtrip(tmp_path, x, sr=48000.0, bits=16, **kw):
    p = str(tmp_path / "t.flac")
    write_flac(p, x, sr, bits=bits, **kw)
    got, got_sr = read_flac(p)
    assert got_sr == sr
    want = _quantize(x, bits).astype(np.float32) / (1 << (bits - 1))
    np.testing.assert_array_equal(got, want.astype(np.float32))
    return p


def test_roundtrip_stereo_noise(tmp_path):
    rng = np.random.default_rng(0)
    t = np.arange(20000) / 48000.0
    x = np.stack([0.4 * np.sin(2 * np.pi * 220 * t),
                  0.2 * rng.standard_normal(20000)]).astype(np.float32)
    _roundtrip(tmp_path, x)


def test_roundtrip_24bit_mono(tmp_path):
    t = np.arange(5000) / 44100.0
    x = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
    _roundtrip(tmp_path, x, sr=44100.0, bits=24)


def test_roundtrip_constant_and_silence(tmp_path):
    x = np.zeros((2, 9000), np.float32)
    x[1, :] = 0.25
    _roundtrip(tmp_path, x)


def test_roundtrip_partial_last_frame_and_odd_blocksize(tmp_path):
    rng = np.random.default_rng(1)
    x = (0.1 * rng.standard_normal((1, 4096 + 777))).astype(np.float32)
    _roundtrip(tmp_path, x)                       # partial final frame
    _roundtrip(tmp_path, x, block_size=1000)      # 16-bit size escape


def test_roundtrip_nonstandard_sample_rate(tmp_path):
    x = (0.1 * np.sin(np.arange(3000) * 0.01)).astype(np.float32)[None]
    _roundtrip(tmp_path, x, sr=12345.0)           # streaminfo-coded rate


def test_audio_load_save_flac(tmp_path):
    from flan_tpu.audio.audio import Audio
    rng = np.random.default_rng(2)
    x = np.clip(0.3 * rng.standard_normal((2, 6000)),
                -0.95, 0.95).astype(np.float32)
    a = Audio(data=x, sample_rate=48000.0)
    p = str(tmp_path / "a.flac")
    a.save_to_file(p)
    b = Audio.load_from_file(p)
    assert b.sample_rate == 48000.0
    np.testing.assert_allclose(np.asarray(b.data), x, atol=2.0 / 32768)


# ===========================================================================
# Hand-built streams for decode-only paths
# ===========================================================================

def _stream(frames_payload, sr=48000, nch=1, bps=16, total=0):
    """Wrap raw frame bytes in fLaC + STREAMINFO."""
    sbw = _BitWriter()
    sbw.write(4096, 16)
    sbw.write(4096, 16)
    sbw.write(0, 24)
    sbw.write(0, 24)
    sbw.write(sr, 20)
    sbw.write(nch - 1, 3)
    sbw.write(bps - 1, 5)
    sbw.write(total, 36)
    sbw.align()
    sinfo = sbw.data() + b"\x00" * 16
    return (b"fLaC" + bytes([0x80]) + len(sinfo).to_bytes(3, "big")
            + sinfo + frames_payload)


def _frame_header(bw, block_size, ch_code, bps_code, frame_no=0,
                  sr_code=10):
    bw.write(0b11111111111110, 14)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(7, 4)                 # explicit 16-bit block size
    bw.write(sr_code, 4)
    bw.write(ch_code, 4)
    bw.write(bps_code, 3)
    bw.write(0, 1)
    for b in _utf8_number(frame_no):
        bw.write(b, 8)
    bw.write(block_size - 1, 16)
    hdr = bytes(bw.buf)
    assert bw.n == 0
    bw.write(_crc8(np.frombuffer(hdr, np.uint8)), 8)


def _finish_frame(bw):
    bw.align()
    body = bw.data()
    return body + struct.pack(">H", _crc16(np.frombuffer(body, np.uint8)))


def _write_verbatim(bw, vals, bits):
    bw.write(0, 1)
    bw.write(1, 6)
    bw.write(0, 1)
    for v in vals:
        bw.write(int(v), bits)


def _rice_codes(bw, residuals, k, method=0, po=0, counts=None):
    bw.write(method, 2)
    bw.write(po, 4)
    pbits = 4 if method == 0 else 5
    parts = np.array_split(np.asarray(residuals, np.int64),
                           1 << po) if counts is None else counts
    for part in parts:
        bw.write(k, pbits)
        for r in part.tolist():
            u = (r << 1) ^ (r >> 63)
            bw.write_unary(u >> k)
            bw.write(u & ((1 << k) - 1), k)


def test_decode_lpc_subframe(tmp_path):
    """LPC order 3 with a real shift: decoder must reproduce the exact
    integer recurrence x[i] = r[i] + (sum c_j x[i-1-j]) >> shift."""
    rng = np.random.default_rng(3)
    n = 64
    order, prec, shift = 3, 12, 9
    coefs = [410, -230, 117]                      # ~0.8, -0.45, 0.23
    warm = rng.integers(-2000, 2000, order).tolist()
    res = rng.integers(-60, 60, n - order).tolist()
    x = list(warm)
    for i in range(order, n):
        p = sum(coefs[j] * x[i - 1 - j] for j in range(order))
        x.append(res[i - order] + (p >> shift))
    assert all(-32768 <= v < 32768 for v in x)

    bw = _BitWriter()
    _frame_header(bw, n, ch_code=0, bps_code=4)
    bw.write(0, 1)
    bw.write(32 | (order - 1), 6)                 # LPC, order 3
    bw.write(0, 1)                                # no wasted bits
    for v in warm:
        bw.write(int(v), 16)
    bw.write(prec - 1, 4)
    bw.write(shift, 5)
    for cc in coefs:
        bw.write(cc, prec)
    _rice_codes(bw, res, k=4)
    data = _stream(_finish_frame(bw), total=n)
    p = tmp_path / "lpc.flac"
    p.write_bytes(data)
    got, _ = read_flac(str(p))
    np.testing.assert_array_equal(
        np.rint(got[0] * 32768).astype(np.int64), np.asarray(x))


@pytest.mark.parametrize("ch_code", [8, 9, 10])
def test_decode_stereo_decorrelation(tmp_path, ch_code):
    """left/side, right/side, mid/side reconstruction (side gets +1 bit)."""
    rng = np.random.default_rng(4 + ch_code)
    n = 48
    L = rng.integers(-30000, 30000, n)
    R = rng.integers(-30000, 30000, n)
    side = L - R
    if ch_code == 8:
        subs = [(L, 16), (side, 17)]
    elif ch_code == 9:
        subs = [(side, 17), (R, 16)]
    else:
        subs = [((L + R) >> 1, 16), (side, 17)]
    bw = _BitWriter()
    _frame_header(bw, n, ch_code=ch_code, bps_code=4)
    for vals, bits in subs:
        _write_verbatim(bw, vals, bits)
    data = _stream(_finish_frame(bw), nch=2, total=n)
    p = tmp_path / f"st{ch_code}.flac"
    p.write_bytes(data)
    got, _ = read_flac(str(p))
    qi = np.rint(got * 32768).astype(np.int64)
    np.testing.assert_array_equal(qi[0], L)
    np.testing.assert_array_equal(qi[1], R)


def test_decode_wasted_bits_and_fixed4(tmp_path):
    """FIXED order 4 + wasted-bits shift."""
    rng = np.random.default_rng(7)
    n = 16
    wasted = 3
    i = np.arange(n, dtype=np.int64)
    base = i ** 3 - 5 * i ** 2 + 3 * i + 7 + rng.integers(-2, 3, n)
    x = (base << wasted).astype(np.int64)
    assert np.abs(x).max() < 32768
    eff = 16 - wasted
    y = x >> wasted
    res = y.copy()
    for _ in range(4):
        res = np.diff(res)
    bw = _BitWriter()
    _frame_header(bw, n, ch_code=0, bps_code=4)
    bw.write(0, 1)
    bw.write(8 + 4, 6)                            # FIXED order 4
    bw.write(1, 1)                                # wasted-bits flag
    bw.write(1, wasted)                           # unary: wasted-1 zeros
    for v in y[:4].tolist():
        bw.write(int(v), eff)
    _rice_codes(bw, res.tolist(), k=2)
    data = _stream(_finish_frame(bw), total=n)
    p = tmp_path / "w.flac"
    p.write_bytes(data)
    got, _ = read_flac(str(p))
    np.testing.assert_array_equal(
        np.rint(got[0] * 32768).astype(np.int64), x)


def test_decode_rice2_partitions_and_escape(tmp_path):
    """RICE2 method, partition order 2, one escaped (raw 7-bit) part."""
    rng = np.random.default_rng(8)
    n = 64
    x = rng.integers(-50, 50, n)
    bw = _BitWriter()
    _frame_header(bw, n, ch_code=0, bps_code=4)
    bw.write(0, 1)
    bw.write(8, 6)                                # FIXED order 0
    bw.write(0, 1)
    bw.write(1, 2)                                # RICE2
    bw.write(2, 4)                                # partition order 2
    parts = np.array_split(x, 4)
    for i, part in enumerate(parts):
        if i == 1:                                # escape: raw 7-bit
            bw.write(0x1F, 5)
            bw.write(7, 5)
            for v in part.tolist():
                bw.write(int(v), 7)
        else:
            bw.write(3, 5)
            for r in part.tolist():
                u = (int(r) << 1) ^ (int(r) >> 63)
                bw.write_unary(u >> 3)
                bw.write(u & 7, 3)
    data = _stream(_finish_frame(bw), total=n)
    p = tmp_path / "r2.flac"
    p.write_bytes(data)
    got, _ = read_flac(str(p))
    np.testing.assert_array_equal(
        np.rint(got[0] * 32768).astype(np.int64), x)


def test_crc_rejects_corruption(tmp_path):
    x = (0.1 * np.sin(np.arange(5000) * 0.01)).astype(np.float32)[None]
    p = str(tmp_path / "c.flac")
    write_flac(p, x, 48000.0)
    raw = bytearray(open(p, "rb").read())
    raw[len(raw) // 2] ^= 0x40
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError):
        read_flac(p)


def test_rice_fallback_matches_fixpoint(monkeypatch):
    """The sequential bisect fallback and the vectorized fixpoint decode
    identical values (forced by capping iterations to zero)."""
    rng = np.random.default_rng(9)
    res = rng.integers(-200, 200, 500).tolist()
    bw = _BitWriter()
    for r in res:
        u = (r << 1) ^ (r >> 63)
        bw.write_unary(u >> 4)
        bw.write(u & 15, 4)
    bw.align()
    br = flac._BitReader(bw.data())
    vals = br.read_rice_block(500, 4)
    np.testing.assert_array_equal(vals, np.asarray(res))
