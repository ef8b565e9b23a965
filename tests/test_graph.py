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
    """The vectorized rasterization equals the reference's per-column
    scalar form (Graph.cpp:69-132): f32 average of 4 nearest-floor
    subsamples, truncated pixel offset, inclusive fill from the
    truncated midline (pinned pixel-golden in test_algo_golden)."""
    from flan_tpu import Rect
    from flan_tpu.graph.graph import WaveformMode
    rng = np.random.default_rng(7)
    d = rng.standard_normal(1000).astype(np.float32) * 0.8
    for mode in (WaveformMode.DIRECT, WaveformMode.SYMMETRIC):
        g = Graph(200, 64)
        g.set_view(Rect(0, -1, 1, 1))
        g.fill_image(Color.black())
        g.draw_waveform(d, mode=mode, color=Color.white())
        img = g.to_uint8()
        view = g.views[0][1]
        n = len(d)
        row_mid = g._row_trunc(view, 0.0)
        for x in (0, 37, 101, 198):
            acc = np.float32(0.0)
            for s in range(4):
                u = np.float32(view.x_v_to_u(
                    np.float32(x) + np.float32(s) / np.float32(4)))
                i = int(np.floor(u / np.float32(1.0) * np.float32(n)))
                v = d[min(max(i, 0), n - 1)]
                acc = np.float32(
                    acc + (abs(v) if mode == WaveformMode.SYMMETRIC
                           else v))
            avg = np.float32(acc / np.float32(4))
            off = int(np.trunc(np.float32(
                np.clip(avg, -1, 1) * np.float32(1.0))
                * np.float32(64) / np.float32(2)))
            if mode == WaveformMode.SYMMETRIC:
                want = set(range(row_mid - off, row_mid + off + 1))
            else:
                want = set(range(min(row_mid, row_mid - off),
                                 max(row_mid, row_mid - off) + 1))
            want = {r for r in want if 0 <= r < 64}
            lit = set(np.nonzero(img[:, x].max(axis=-1) > 200)[0].tolist())
            assert lit == want, (mode, x, sorted(lit), sorted(want))


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


# --- Round-5 Graph tail (reference Graph.h:207,232,256,262,272) -----------

def _fresh(w=256, h=128, view=(-1, -1, 1, 1)):
    from flan_tpu import Rect
    g = Graph(w, h)
    g.set_view(Rect(*view))
    g.fill_image(Color.black())
    return g


def test_draw_point_disc():
    g = _fresh()
    g.draw_point((0.0, 0.0), radius=10, color=Color.white())
    img = g.to_uint8().max(axis=-1) > 200
    ys, xs = np.nonzero(img)
    cx, cy = xs.mean(), ys.mean()
    # filled disc: area ~ pi*r^2, roughly round (extent ~2r both axes)
    assert 250 < img.sum() < 420
    assert 18 <= xs.max() - xs.min() <= 22
    assert 18 <= ys.max() - ys.min() <= 22
    # all lit pixels within radius+1.5 of the centroid
    assert np.all(np.hypot(xs - cx, ys - cy) <= 11.5)


def test_draw_points_calls_draw_point():
    g = _fresh()
    g.draw_points([(-0.5, -0.5), (0.5, 0.5)], radius=4, color=Color.white())
    img = g.to_uint8().max(axis=-1) > 200
    # two separate discs
    assert 2 * 30 < img.sum() < 2 * 90
    assert img[:, :128].sum() > 20 and img[:, 128:].sum() > 20


def test_draw_functions_spaced_hues():
    g = _fresh()
    g.draw_functions([lambda x: 0.5 * x, lambda x: -0.5 * x,
                      lambda x: 0.25 + 0 * x])
    img = g.to_uint8()
    lit = img.max(axis=-1) > 100
    assert lit.sum() > 3 * 200
    # hue 0 (red) and hue 120 (green) and hue 240 (blue) all appear
    reds = (img[..., 0] > 150) & (img[..., 1] < 80) & (img[..., 2] < 80)
    greens = (img[..., 1] > 150) & (img[..., 0] < 80) & (img[..., 2] < 80)
    blues = (img[..., 2] > 150) & (img[..., 0] < 80) & (img[..., 1] < 80)
    assert reds.any() and greens.any() and blues.any()


def test_draw_function_from_points():
    # the vector<vec2> overload: linear interpolation, domain fits points
    g = _fresh()
    g.draw_function([(-0.5, -0.5), (0.5, 0.5)], color=Color.white())
    img = g.to_uint8().max(axis=-1) > 200
    cols = np.nonzero(img.any(axis=0))[0]
    # drawn only inside the point domain [-0.5, 0.5] -> pixels [64, 192]
    assert cols.min() >= 60 and cols.max() <= 196
    # diagonal: lit row rises with column
    first_rows = np.array([np.nonzero(img[:, c])[0].mean()
                           for c in cols[2:-2]])
    assert first_rows[0] > first_rows[-1]  # y up = row down


def test_draw_linear_grid_both_axes():
    from flan_tpu import Rect
    g = _fresh(view=(-2, -2, 2, 2))
    g.draw_linear_grid(1.0, 1.0, color=Color.white())
    img = g.to_uint8().max(axis=-1) > 200
    full_cols = np.nonzero(img.all(axis=0))[0]
    full_rows = np.nonzero(img.all(axis=1))[0]
    assert len(full_cols) >= 3 and len(full_rows) >= 3


def test_draw_log_grid_y_reference_quirk():
    # subdivisions use log(1+step)/log(lines_per_step) UNSCALED by spacing
    g = _fresh(view=(0, 0, 1, 1))
    g.draw_log_grid_y(1.0, 10, color=Color.white())
    img = g.to_uint8().max(axis=-1) > 200
    rows = np.nonzero(img.all(axis=1))[0]
    # log-spaced: lines bunch toward the top of the unit cell (y->1 is
    # row->0); expect ~9 distinct lines in-view
    assert 6 <= len(rows) <= 12
    ys = 1.0 - rows / (g.height - 1)
    # step 9 lands exactly on y=1.0 which is excluded (y < U.y2)
    expected = np.log(1.0 + np.arange(1, 9)) / np.log(10.0)
    for e in expected[2:]:
        assert np.min(np.abs(ys - e)) < 0.03


def test_draw_float_digits():
    g = _fresh(512, 128, view=(0, 0, 8, 2))
    g.draw_float((0.5, 0.5), 24, 48, -12.5, color=Color.white())
    img = g.to_uint8().max(axis=-1) > 200
    # minus, '1', '2', dot, '5', '0', '0' -> seven glyph cells of lit
    # strokes; sanity: lit pixels spread over ~7 cell widths
    assert img.sum() > 200
    cols = np.nonzero(img.any(axis=0))[0]
    assert cols.max() - cols.min() > 5 * 24
    # '1' is a single vertical stroke: some column has a tall run
    col_runs = img.sum(axis=0)
    assert col_runs.max() >= 40


def test_draw_float_clips_at_view_edge():
    g = _fresh(128, 64, view=(0, 0, 1, 1))
    g.draw_float((0.9, 0.2), 32, 24, 123.0, color=Color.white())
    img = g.to_uint8().max(axis=-1) > 200
    # first digit box already leaves U -> nothing drawn
    assert img.sum() == 0


def test_primitive_segments():
    from flan_tpu import Rect, View
    g = _fresh()
    view = g.views[0][1]
    g.draw_horizontal_line(view, -1.0, 1.0, 0.5, Color.white())
    g.draw_vertical_line(view, -1.0, 1.0, 0.5, Color.white())
    g.draw_line_segment(view, -1.0, -1.0, 1.0, 1.0, Color.white())
    g.set_rect(view, Rect(-0.9, -0.9, -0.6, -0.6), Color.white())
    g.set_point(view, 0.0, 0.0, Color.white())
    img = g.to_uint8().max(axis=-1) > 200
    # reference flip is height-1 - yUToV (Graph.cpp:297-305):
    # y=0.5 -> row 127 - 96 = 31
    assert img[31, :].all()
    # vertical at x=0.5 -> col 192; bitmap_image's segment end is
    # EXCLUSIVE (pixel-golden graph_* fixtures), so the last row of the
    # span is not drawn
    assert img[:127, 192].all()
    assert not img[127, 192]
    assert img.sum() > 256 + 128 + 200


def test_function_convert_to_graph_and_bmp(tmp_path):
    from flan_tpu import Function
    f = Function(lambda x: np.sin(x))
    g = f.convert_to_graph()
    img = g.to_uint8()
    # white background, grey unit grid, black curve
    assert (img.min(axis=-1) > 240).mean() > 0.5
    assert (img.max(axis=-1) < 40).sum() > 200
    p = str(tmp_path / "f.bmp")
    f.save_to_bmp(p)
    assert open(p, "rb").read()[:2] == b"BM"


def test_function_distributions():
    from flan_tpu import Function
    u = Function.uniform_distribution(lambda t: t, lambda t: t + 1.0,
                                      seed=7)
    xs = np.full(4096, 2.0, np.float32)
    vals = np.asarray(u(xs))
    assert vals.min() >= 2.0 and vals.max() <= 3.0
    assert 2.4 < vals.mean() < 2.6
    nrm = Function.normal_distribution(1.0, 0.1, seed=7)
    v = np.asarray(nrm(xs))
    assert 0.95 < v.mean() < 1.05 and 0.05 < v.std() < 0.15
    # sigma <= 0 short-circuits to the mean (reference quirk)
    degenerate = Function.normal_distribution(3.0, 0.0, seed=1)
    assert np.allclose(np.asarray(degenerate(xs)), 3.0)
    # camelCase aliases bound
    assert Function.uniformDistribution is Function.uniform_distribution
