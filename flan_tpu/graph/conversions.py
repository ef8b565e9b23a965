"""Audio -> Graph and PV -> Graph conversions.

TPU-native re-design of the reference graph conversions
(reference: src/flan/Conversions/AudioGraph.cpp, PVGraph.cpp). Spectral
tensors (FFT magnitudes, PV value planes) are computed on device; the pixel
rendering is the host-side Graph.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from flan_tpu.core.types import power_of_2_container
from flan_tpu.graph.graph import Graph, WaveformMode
from flan_tpu.utils.geometry import Color, Interval, Rect


def audio_convert_to_graph(self, interval=None, width: int = -1,
                           height: int = -1,
                           mode: str = WaveformMode.SYMMETRIC,
                           timeline_scale: float = 0.0) -> Graph:
    """(reference AudioGraph.cpp:15-53)"""
    g = Graph(width, height)
    if self.is_null():
        return g
    if interval is None or interval.x2 == -1:
        interval = Interval(0.0 if interval is None else interval.x1,
                            self.length)
    g.fill_image(Color.from_hsv(0, 0, 0.04))
    g.add_full_split_view_y(
        Rect(interval.x1, -1.0, interval.x2, 1.0), self.num_channels)
    start = int(np.clip(self.time_to_frame(interval.x1), 0,
                        self.num_frames))
    end = int(np.clip(self.time_to_frame(interval.x2), 0, self.num_frames))
    datas = [np.asarray(self.data[c, start:end])
             for c in range(self.num_channels)]
    g.draw_waveforms(datas, Rect(interval.x1, -1.0, interval.x2, 1.0),
                     0, mode)
    if timeline_scale > 0:
        big = 4.0 ** math.floor(math.log2(max(interval.w, 1e-9)) / 2 - 0.5)
        g.draw_x_ticks(big / 4.0, 1.0, 0.0, timeline_scale / 2, -1,
                       Color.from_hsv(0, 0, 0.6))
        g.draw_x_ticks(big, 1.0, 0.0, timeline_scale, -1,
                       Color.from_hsv(0, 0, 1.0))
    return g


def audio_save_to_bmp(self, filename: str, interval=None, width: int = -1,
                      height: int = -1) -> None:
    audio_convert_to_graph(self, interval, width, height).save_image(
        filename)


def audio_convert_to_spectrum_graph(self, width: int = -1,
                                    height: int = -1,
                                    smoothing_frames: int = 128) -> Graph:
    """Log-frequency smoothed magnitude spectrum
    (reference AudioGraph.cpp:55-131)."""
    g = Graph(width, height)
    if self.is_null():
        return g
    spectrum_log = math.log2(self.sample_rate / 2.0)
    g.add_full_split_view_y(Rect(4.0, -0.1, spectrum_log, 1.1),
                            self.num_channels)
    g.fill_image(Color.from_hsv(0, 0, 0.05))
    g.draw_log_grid_x(1.0, 2, color=Color.from_hsv(0, 0, 0.1))
    g.draw_linear_grid_y(0.1, color=Color.from_hsv(0, 0, 0.1))
    g.draw_linear_grid_x(1.0, color=Color.from_hsv(0, 0, 0.25))

    n = power_of_2_container(self.num_frames)
    mags = jnp.abs(jnp.fft.rfft(self.data, n=n, axis=-1))
    # hann smoothing via convolution (AudioGraph.cpp:88-93)
    from flan_tpu.ops.windows import hann_window
    win = hann_window(max(smoothing_frames, 2))
    dft = 2 * power_of_2_container(mags.shape[-1])
    sm = jnp.fft.irfft(jnp.fft.rfft(mags, n=dft, axis=-1)
                       * jnp.fft.rfft(win, n=dft)[None], n=dft,
                       axis=-1)[:, : mags.shape[-1]]
    sm = jnp.sqrt(jnp.maximum(sm, 0.0) / jnp.maximum(jnp.max(sm), 1e-12))
    sm_np = np.asarray(sm)

    # resample onto the log-frequency axis per channel
    width_px = g.width
    log_f = np.linspace(4.0, spectrum_log, width_px)
    freqs = 2.0 ** log_f
    bins = np.clip((freqs / (self.sample_rate / n)).astype(np.int64), 0,
                   sm_np.shape[-1] - 1)
    datas = [2.0 * sm_np[c, bins] - 1.0  # to [-1,1] for direct waveform
             for c in range(self.num_channels)]
    g.draw_waveforms(datas, Rect(4.0, -1.0, spectrum_log, 1.0), 0,
                     WaveformMode.DIRECT)
    g.draw_axes(color=Color.white())
    return g


def audio_save_spectrum_to_bmp(self, filename: str, width: int = -1,
                               height: int = -1,
                               smoothing_frames: int = 128) -> None:
    audio_convert_to_spectrum_graph(self, width, height,
                                    smoothing_frames).save_image(filename)


def pv_convert_to_graph(self, domain=None, width: int = -1,
                        height: int = -1,
                        timeline_scale: float = 0.0) -> Graph:
    """HSV-magnitude spectrogram (reference PVGraph.cpp:6-49):
    sqrt brings up dark areas, log2 scaling brings up high frequencies."""
    g = Graph(width, height)
    if self.is_null():
        return g
    height_hz = self.bin_to_frequency(self.num_bins - 1)
    if domain is None:
        domain = Rect(0, 0, self.length, height_hz)
    if domain.x2 == -1:
        domain = Rect(domain.x1, domain.y1, self.length, domain.y2)
    if domain.y2 == -1:
        domain = Rect(domain.x1, domain.y1, domain.x2, height_hz)

    max_mag = float(jnp.max(jnp.abs(self.mag)))
    g.add_full_split_view_y(domain, self.num_channels)
    if max_mag > 0:
        freqs = jnp.arange(self.num_bins, dtype=jnp.float32) \
            * self.bin_width
        vals = (jnp.sqrt(jnp.abs(self.mag) / max_mag)
                * (jnp.log2(2.0 + freqs)[None, None, :] / 4.0))
        vals_np = np.asarray(jnp.clip(vals, 0.0, 1.0))
        g.draw_spectrograms(
            [vals_np[c] for c in range(self.num_channels)],
            Rect(0, 0, self.length, height_hz))
    if timeline_scale > 0:
        big = 4.0 ** math.floor(math.log2(max(domain.w, 1e-9)) / 2 - 0.5)
        g.draw_x_ticks(big, domain.y2, 0.0, timeline_scale, -1,
                       Color.from_hsv(0, 0, 1.0))
    return g


def pv_save_to_bmp(self, filename: str, domain=None, width: int = -1,
                   height: int = -1) -> None:
    pv_convert_to_graph(self, domain, width, height).save_image(filename)
