"""Golden byte-level format tests: files constructed by hand to the
reference's specifications must decode to the expected values
(format parity evidence beyond self-round-trips)."""
import struct

import numpy as np

from flan_tpu.io.flan_format import read_flan
from flan_tpu.io.wav import read_wav


def test_wav_pcm16_golden(tmp_path):
    """Hand-built 2-frame stereo PCM16 WAV decodes to known samples."""
    samples = [(16384, -16384), (32767, 0)]  # (L, R) per frame
    raw = b"".join(struct.pack("<hh", l, r) for l, r in samples)
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 4, 4, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    p = str(tmp_path / "g.wav")
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)
    data, sr, _ = read_wav(p)
    assert sr == 44100
    assert data.shape == (2, 2)
    np.testing.assert_allclose(
        data, [[16384 / 32768, 32767 / 32768], [-16384 / 32768, 0.0]],
        atol=1e-6)


def test_flan_golden(tmp_path):
    """Hand-built .flan per PVBuffer.h:85-113 decodes to known MF values."""
    num_channels, num_frames, num_bins = 1, 1, 2
    sr, hop, window = 48000, 128, 256
    dft = 2 * (num_bins - 1)  # 2

    def i24(v):
        u = v & 0xFFFFFF
        return bytes([u & 0xFF, (u >> 8) & 0xFF, (u >> 16) & 0xFF])

    # bin 0: mag = 0.5*dft (quantized 0.5 * 2^23), freq = -0.25*sr
    # bin 1: mag = dft (clamped to 1.0), freq = sr/2
    data = (i24(1 << 22) + i24(-(1 << 21))
            + i24((1 << 23) - 1) + i24(1 << 22))
    fmt = struct.pack("<HHIIIIIIH", 1, num_channels, num_frames, num_bins,
                      sr, hop, window, 24, 1)
    p = str(tmp_path / "g.flan")
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4) + b"PV\x00\x00"
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)
    mag, freq, sr_out, hop_out, win_out = read_flan(p)
    assert (sr_out, hop_out, win_out) == (48000.0, 128, 256)
    np.testing.assert_allclose(mag[0, 0], [0.5 * dft, dft * (1 - 2 ** -23)],
                               rtol=1e-6)
    np.testing.assert_allclose(freq[0, 0], [-0.25 * sr, 0.5 * sr],
                               rtol=1e-6)
