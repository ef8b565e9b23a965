"""Graph rendering tests (reference Graph.cpp, AudioGraph.cpp, PVGraph.cpp)."""
import numpy as np
import pytest

from flan_tpu import Audio, Graph, Color

SR = 8000.0


def sine(freq=440.0, seconds=0.25, channels=1):
    t = np.arange(int(seconds * SR), dtype=np.float32) / SR
    rows = [0.5 * np.sin(2 * np.pi * freq * (i + 1) * t)
            for i in range(channels)]
    return Audio.create_from_array(np.stack(rows), SR)


def test_waveform_graph(tmp_path):
    a = sine(channels=2)
    g = a.convert_to_graph()
    img = g.to_uint8()
    assert img.shape == (Graph.DEFAULT_HEIGHT, Graph.DEFAULT_WIDTH, 3)
    # waveform pixels painted over the near-black background
    assert (img.max(axis=-1) > 100).sum() > 1000
    p = str(tmp_path / "w.bmp")
    g.save_image(p)
    blob = open(p, "rb").read()
    assert blob[:2] == b"BM"
    assert len(blob) >= 54 + Graph.DEFAULT_WIDTH * Graph.DEFAULT_HEIGHT * 3


def test_spectrogram_graph(tmp_path):
    pv = sine(440.0).convert_to_PV(512, 64, 512)
    g = pv.convert_to_graph()
    img = g.to_uint8()
    # the 440 Hz line should light pixels in the row band around 440 Hz
    height_hz = pv.bin_to_frequency(pv.num_bins - 1)
    row = int(g.height * (1 - 440.0 / height_hz))
    band = img[row - 6:row + 6].max()
    other = img[row - 150:row - 100].max()
    assert band > other
    g.save_image(str(tmp_path / "s.bmp"))


def test_spectrum_graph():
    g = sine(440.0).convert_to_spectrum_graph()
    assert (g.to_uint8().max(axis=-1) > 60).sum() > 100


def test_draw_function_and_axes():
    g = Graph(256, 128)
    g.set_view(__import__("flan_tpu").Rect(-1, -1, 1, 1))
    g.fill_image(Color.black())
    g.draw_axes(color=Color(0.5, 0.5, 0.5))
    g.draw_function(lambda x: x * x, color=Color.white())
    img = g.to_uint8()
    # parabola: bright pixels in every column, including off-center
    assert img[:, 64].max() > 200
    assert (img.max(axis=-1) > 200).sum() > 100
    # the white curve at x=-0.5 sits near y=0.25 (pixel row ~48 of 128)
    rows_lit = np.nonzero(img[:, 64].max(axis=-1) > 200)[0]
    assert abs(rows_lit.mean() - (64 - 0.25 * 64)) < 8


def test_draw_waveform_matches_scalar_oracle():
    """The reduceat rasterization equals the per-column scalar form
    (reference Graph.cpp:69-150)."""
    from flan_tpu import Rect
    from flan_tpu.graph.graph import WaveformMode
    rng = np.random.default_rng(7)
    d = np.clip(rng.standard_normal(1000).astype(np.float32), -1, 1)
    for mode in (WaveformMode.DIRECT, WaveformMode.SYMMETRIC):
        g = Graph(200, 64)
        g.set_view(Rect(0, -1, 1, 1))
        g.fill_image(Color.black())
        g.draw_waveform(d, mode=mode, color=Color.white())
        img = g.to_uint8()
        view = g.views[0][1]
        n = len(d)
        for x in (0, 37, 101, 198):
            u0 = view.x_v_to_u(np.array([x]))[0]
            u1 = view.x_v_to_u(np.array([x + 1]))[0]
            i0 = int(u0 * n)
            i1 = min(int(u1 * n), n)
            if not (0 <= i0 < n):
                continue
            span = d[i0:max(i1, i0 + 1)]
            if mode == WaveformMode.SYMMETRIC:
                hi, lo = float(np.abs(span).max()), -float(np.abs(span).max())
            else:
                lo, hi = float(span.min()), float(span.max())
            y_top = view.y_u_to_v(np.array([hi]))[0]
            y_bot = view.y_u_to_v(np.array([lo]))[0]
            lit = np.nonzero(img[:, x].max(axis=-1) > 200)[0]
            assert lit.size
            assert abs(lit.min() - np.floor(y_top)) <= 1
            assert abs(lit.max() - np.ceil(y_bot)) <= 1


def test_draw_function_scalar_only_callable():
    """A callable that rejects array input falls back to per-pixel eval."""
    from flan_tpu import Rect
    g = Graph(128, 64)
    g.set_view(Rect(-1, -1, 1, 1))
    g.fill_image(Color.black())

    def scalar_only(x):
        if np.ndim(x) != 0:
            raise TypeError("scalar only")
        return float(x)

    g.draw_function(scalar_only, color=Color.white())
    img = g.to_uint8()
    assert (img.max(axis=-1) > 200).sum() > 50
    # identity line: at x=+0.5 (pixel 96) the lit row is near y=+0.5
    lit = np.nonzero(img[:, 96].max(axis=-1) > 200)[0]
    assert abs(lit.mean() - (32 - 0.5 * 32)) < 6
