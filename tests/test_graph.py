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
