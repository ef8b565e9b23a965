"""CLI batch processor (python -m flan_tpu)."""
import numpy as np
import pytest

from flan_tpu import Audio
from flan_tpu.cli import main

SR = 8000.0


@pytest.fixture()
def wavs(tmp_path):
    paths = []
    for i, freq in enumerate((330.0, 440.0)):
        t = np.arange(int(0.4 * SR), dtype=np.float32) / SR
        a = Audio.create_from_array(
            (0.4 * np.sin(2 * np.pi * freq * t))[None], SR)
        p = str(tmp_path / f"in{i}.wav")
        a.save_to_file(p)
        paths.append(p)
    return paths


def test_cli_stretch(tmp_path, wavs):
    out = str(tmp_path / "out")
    assert main(["stretch", "--factor", "2.0", out] + wavs) == 0
    for p in ("in0.wav", "in1.wav"):
        o = Audio.load_from_file(str(tmp_path / "out" / p))
        assert not o.is_null()
        assert o.num_frames >= int(0.7 * SR)  # ~2x the 0.4 s input


def test_cli_repitch_and_filter(tmp_path, wavs):
    out = str(tmp_path / "out2")
    assert main(["repitch", "--factor", "1.5", out, wavs[0]]) == 0
    o = Audio.load_from_file(str(tmp_path / "out2" / "in0.wav"))
    d = np.asarray(o.data[0, 800:2400])
    dom = np.abs(np.fft.rfft(d)).argmax() * SR / len(d)
    assert dom == pytest.approx(495.0, abs=15)  # 330 * 1.5

    out3 = str(tmp_path / "out3")
    assert main(["filter-lowpass", "--cutoff", "500", out3, wavs[1]]) == 0
    o = Audio.load_from_file(str(tmp_path / "out3" / "in1.wav"))
    assert not o.is_null()


def test_cli_morph_and_resample(tmp_path, wavs):
    out = str(tmp_path / "m")
    assert main(["morph", "--amount", "0.5", out] + wavs) == 0
    o = Audio.load_from_file(str(tmp_path / "m" / "in0_morph.wav"))
    assert not o.is_null()

    out2 = str(tmp_path / "r")
    assert main(["resample", "--rate", "12000", out2, wavs[0]]) == 0
    o = Audio.load_from_file(str(tmp_path / "r" / "in0.wav"))
    assert o.sample_rate == 12000.0
    assert o.num_frames == pytest.approx(0.4 * 12000, abs=4)


def test_cli_spectrogram(tmp_path, wavs):
    out = str(tmp_path / "s")
    assert main(["spectrogram", out, wavs[0]]) == 0
    blob = open(str(tmp_path / "s" / "in0.bmp"), "rb").read(2)
    assert blob == b"BM"


def test_prefetching_loader(tmp_path, wavs):
    from flan_tpu.io.loader import iter_audio_prefetched
    out = list(iter_audio_prefetched(wavs, depth=2))
    assert [p for p, _ in out] == wavs  # input order preserved
    for _, clip in out:
        assert not clip.is_null()
        assert clip.num_frames == int(0.4 * SR)

    with pytest.raises(RuntimeError, match="failed to load"):
        list(iter_audio_prefetched([wavs[0], str(tmp_path / "nope.wav")]))


def test_cli_stretch_mixed_lengths_not_padded(tmp_path):
    """Mixed-length inputs must not get padded-length outputs (the batch
    path pads to the longest; the CLI routes mixed lengths directly)."""
    paths = []
    for i, sec in enumerate((0.2, 0.4)):
        t = np.arange(int(sec * SR), dtype=np.float32) / SR
        a = Audio.create_from_array(
            (0.4 * np.sin(2 * np.pi * 440 * t))[None], SR)
        p = str(tmp_path / f"m{i}.wav")
        a.save_to_file(p)
        paths.append(p)
    out = str(tmp_path / "mixed")
    assert main(["stretch", "--factor", "2.0", out] + paths) == 0
    o0 = Audio.load_from_file(str(tmp_path / "mixed" / "m0.wav"))
    o1 = Audio.load_from_file(str(tmp_path / "mixed" / "m1.wav"))
    assert o0.num_frames < 0.6 * SR          # ~0.4 s, not padded to 0.8 s
    assert o1.num_frames > 0.7 * SR


def test_cli_basename_collision(tmp_path):
    """Same-basename inputs from different directories must not overwrite
    each other (round-2 review B, finding 1)."""
    paths = []
    for sub, freq in (("a", 300.0), ("b", 600.0)):
        d = tmp_path / sub
        d.mkdir()
        t = np.arange(int(0.3 * SR), dtype=np.float32) / SR
        Audio.create_from_array(
            (0.4 * np.sin(2 * np.pi * freq * t))[None], SR).save_to_file(
            str(d / "loop.wav"))
        paths.append(str(d / "loop.wav"))
    out = str(tmp_path / "c")
    assert main(["resample", "--rate", "12000", out] + paths) == 0
    import os
    names = sorted(os.listdir(out))
    assert names == ["loop.wav", "loop_1.wav"]


def test_loader_abandonment_joins_producer(wavs):
    """Breaking out of the prefetch iterator must not leak a blocked
    producer thread (round-2 review B, finding 4)."""
    import threading
    from flan_tpu.io.loader import iter_audio_prefetched
    before = threading.active_count()
    it = iter_audio_prefetched(wavs * 4, depth=1)
    next(it)
    it.close()  # abandon: generator finally sets stop + joins
    assert threading.active_count() <= before + 1


def test_cli_cancel_token(tmp_path, monkeypatch):
    """CancelToken is honored between clip dispatches (utils/cancel.py;
    reference defines.h:49-62 cancellation analog)."""
    import numpy as np
    from flan_tpu import Audio
    from flan_tpu.cli import main
    from flan_tpu.utils.cancel import CancelToken, Cancelled
    sr = 8000.0
    t = np.arange(2000, dtype=np.float32) / sr
    for i in range(2):
        Audio.create_from_array(
            (0.3 * np.sin(2 * np.pi * 440 * t))[None], sr
        ).save_to_file(str(tmp_path / f"in{i}.wav"))
    tok = CancelToken()
    tok.cancel()
    with pytest.raises(Cancelled):
        main(["stretch", "--factor", "1.5", str(tmp_path / "out"),
              str(tmp_path / "in0.wav"), str(tmp_path / "in1.wav")],
             cancel=tok)


def test_cli_convolve_granulate_stereo_delay(tmp_path):
    rng = np.random.default_rng(0)
    stereo = str(tmp_path / "st.wav")
    Audio.create_from_array(
        (rng.standard_normal((2, int(0.6 * SR))) * 0.2).astype(np.float32),
        SR).save_to_file(stereo)
    ir = str(tmp_path / "ir.wav")
    Audio.create_from_array(
        (rng.standard_normal((1, 400)) * np.exp(-np.arange(400) / 100.0)
         ).astype(np.float32), SR).save_to_file(ir)

    out = tmp_path / "conv"
    assert main(["convolve", "--ir", ir, str(out), stereo]) == 0
    assert not Audio.load_from_file(str(out / "st.wav")).is_null()

    out = tmp_path / "gran"
    assert main(["granulate", "--length", "0.8", str(out), stereo]) == 0
    assert not Audio.load_from_file(str(out / "st.wav")).is_null()

    out = tmp_path / "sdel"
    assert main(["stereo-delay", "--length", "1.0", "--l-time", "0.05",
                 "--r-time", "0.08", str(out), stereo]) == 0
    got = Audio.load_from_file(str(out / "st.wav"))
    assert got.num_frames == int(1.0 * SR)

    # mono input must fail cleanly for the stereo-only effect
    mono = str(tmp_path / "mono.wav")
    Audio.create_from_array(
        np.zeros((1, 1000), np.float32), SR).save_to_file(mono)
    with pytest.raises(SystemExit):
        main(["stereo-delay", "--length", "1.0", "--l-time", "0.05",
              "--r-time", "0.08", str(tmp_path / "x"), mono])


def test_cli_eq_bandpass(tmp_path):
    import numpy as np
    from flan_tpu import Audio
    from flan_tpu.cli import main
    sr = 8000.0
    t = np.arange(8192, dtype=np.float32) / sr
    x = (0.4 * np.sin(2 * np.pi * 440 * t)
         + 0.4 * np.sin(2 * np.pi * 2500 * t)).astype(np.float32)
    p = str(tmp_path / "in.wav")
    Audio.create_from_array(x[None], sr).save_to_file(p)
    out_dir = str(tmp_path / "out")
    assert main(["eq", "--low", "100", "--high", "1000", out_dir, p]) == 0
    y = np.asarray(Audio.load_from_file(out_dir + "/in.wav").data)
    f = np.fft.rfftfreq(y.shape[-1], 1 / sr)
    mag = np.abs(np.fft.rfft(y[0]))
    keep = mag[np.argmin(abs(f - 440))]
    kill = mag[np.argmin(abs(f - 2500))]
    assert keep > 100 * max(kill, 1e-9)


def test_cli_wavetable(tmp_path):
    import numpy as np
    from flan_tpu import Audio
    from flan_tpu.cli import main
    sr = 8000.0
    t = np.arange(int(sr), dtype=np.float32) / sr
    # drifting harmonic tone: YIN-trackable (the reference gate rejects
    # perfectly periodic inputs) and the growing 2nd harmonic keeps the
    # table's waves distinct
    ph = 2 * np.pi * (220.0 * t + 10.0 * t * t)
    x = (0.5 * np.sin(ph) + 0.2 * np.sin(2 * ph) * t
         + 0.1 * np.sin(3 * ph + 1.0)).astype(np.float32)
    p = str(tmp_path / "in.wav")
    Audio.create_from_array(x[None], sr).save_to_file(p)
    out_dir = str(tmp_path / "out")
    assert main(["wavetable", "--length", "0.5", "--freq", "110",
                 out_dir, p]) == 0
    y = np.asarray(Audio.load_from_file(out_dir + "/in.wav").data)
    assert y.shape[-1] == int(0.5 * sr)
    f = np.fft.rfftfreq(y.shape[-1], 1 / sr)
    mag = np.abs(np.fft.rfft(y[0]))
    dom = f[np.argmax(mag)]
    # dominant output frequency tracks --freq (within a harmonic's slack)
    assert 80 < dom < 260, dom
