"""Wavetable: pitch-tracked waveform extraction and playback synthesis.

TPU-native re-design of the reference Wavetable
(reference: src/flan/Wavetable.h:12-126, Wavetable.cpp). Key changes:

* The per-waveform FFTW resample loop (Wavetable.cpp:67-132) becomes ONE
  batched windowed-sinc gather over all waveforms at once - each waveform's
  fixed-wavelength representation reads fractional positions from its source
  span (periodic bandlimited interpolation).
* Playback (Wavetable.cpp:266-334) replaces the blockwise WDL resampler
  with a block-integrated read-position curve and a dense dual-table gather
  with crossfaded table indices.
* The sequential waveform-start walk and zero-crossing snapping stay on
  host (tiny control data); pitch estimates come from the batched YIN op.
"""
from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from flan_tpu.func.function import as_function
from flan_tpu.ops.resample import fractional_gather


class SnapMode:
    NONE = "none"
    ZERO = "zero"
    LEVEL = "level"


class PitchMode:
    NONE = "none"
    LOCAL = "local"
    GLOBAL = "global"


def _snap_frame(data: np.ndarray, frame: int, height: float,
                search: int) -> int:
    """Nudge frame to the nearest crossing of `height`
    (reference snap_frame_to_sample, Wavetable.cpp:19-60)."""
    n = len(data)
    frame = int(np.clip(frame, 0, n - 1))
    search = int(max(search, 0))
    lo = max(frame - search, 0)
    hi = min(frame + search, n - 1)
    above = data[frame] > height
    for off in range(search + 1):
        left = frame - off
        if left >= lo and (data[left] > height) != above:
            return left + 1
        right = frame + off
        if right < hi and (data[right] > height) != above:
            return right
    window = np.arange(lo, hi + 1)
    r = 1.0 + np.abs(window - frame) / max(search, 1)
    dist = np.abs(data[window] - height) * r
    return int(window[dist.argmin()])


class Wavetable:
    """table: [channels, num_waves, wavelength] float32 device array."""

    def __init__(self, source=None, snap_mode: str = SnapMode.ZERO,
                 pitch_mode: str = PitchMode.LOCAL, wavelength: int = 2048,
                 snap_ratio: float = 0.3, fixed_frame_size: int = 256,
                 *, _table=None, _starts=None, _num_source_frames=0,
                 _sample_rate=48000.0):
        if source is None:
            self.table = _table
            self.waveform_starts = _starts or []
            self.wavelength = wavelength
            self.num_source_frames = _num_source_frames
            self.sample_rate = _sample_rate
            return
        self.wavelength = wavelength
        self.sample_rate = float(source.sample_rate)
        self.num_source_frames = source.num_frames
        self.waveform_starts = _get_waveform_starts(
            source, snap_mode, pitch_mode, wavelength, snap_ratio,
            fixed_frame_size)
        self.table = _resample_waveforms(source, self.waveform_starts,
                                         wavelength)

    @staticmethod
    def from_function(f, num_waves: int, wavelength: int = 2048,
                      sample_rate: float = 48000.0) -> "Wavetable":
        """Sample f on [k, k+1) per wave (reference Wavetable.cpp:235-248)."""
        fn = as_function(f)
        grid = (jnp.arange(num_waves)[:, None]
                + jnp.arange(wavelength)[None, :] / wavelength)
        table = jnp.asarray(fn(grid.astype(jnp.float32)),
                            jnp.float32)[None]  # [1, W, L]
        wt = Wavetable(_table=table,
                       _starts=[list(range(num_waves))],
                       _num_source_frames=num_waves,
                       _sample_rate=sample_rate, wavelength=wavelength)
        return wt

    def is_null(self) -> bool:
        return (self.table is None or self.wavelength <= 0
                or not self.waveform_starts
                or any(len(s) == 0 for s in self.waveform_starts)
                or self.num_source_frames <= 0)

    def get_num_waveforms(self, channel: int = 0) -> int:
        return len(self.waveform_starts[channel])

    def get_waveform(self, waveform_index: int, channel: int) -> np.ndarray:
        """One table cycle as a numpy array (reference Wavetable.cpp:454-461
        returns a raw sample pointer; an array is the Python analog)."""
        return np.asarray(self.table[channel, waveform_index])

    def ratio_to_table_index(self, r, channel: int = 0):
        """Map a [0,1] source-position ratio to a fractional table index,
        preserving the source-time distribution of extracted waveforms
        (reference Wavetable.cpp:463-488)."""
        out = self._ratio_to_table_index(np.asarray(r, np.float64), channel)
        return float(out) if np.ndim(r) == 0 else out

    # --- Playback (reference Wavetable.cpp:266-334) -------------------------
    def _ratio_to_table_index(self, r: np.ndarray, channel: int
                              ) -> np.ndarray:
        """Map [0,1] through the source-time distribution of waveforms
        (reference Wavetable.cpp:463-488)."""
        starts = np.asarray(self.waveform_starts[channel], np.float64)
        src = np.asarray(r, np.float64) * self.num_source_frames
        idx = np.searchsorted(starts, src, side="right")
        idx = np.clip(idx, 1, len(starts) - 1)
        left = starts[idx - 1]
        right = starts[idx]
        out = idx - 1 + (src - left) / np.maximum(right - left, 1e-9)
        out = np.where(src <= 0, 0.0, out)
        return np.clip(out, 0.0, len(starts) - 1)

    def synthesize(self, length: float, freq, ratio=0.0,
                   smooth: bool = True, granularity: float = 0.001):
        """Variable-rate wavetable playback with table crossfading."""
        from flan_tpu.audio.audio import Audio
        if self.is_null():
            return Audio.create_null()
        sr = self.sample_rate
        out_frames = int(length * sr)
        gran = max(1, int(granularity * sr))
        nblocks = -(-out_frames // gran)
        tgrid = np.arange(nblocks, dtype=np.float64) * gran / sr

        freq_fn = as_function(freq)
        ratio_fn = as_function(ratio)

        def host_sample(fn):
            if fn.is_constant:
                return np.full(nblocks, fn.constant_value, np.float64)
            v = np.asarray(fn(jnp.asarray(tgrid, jnp.float32)),
                           np.float64).reshape(-1)
            return np.broadcast_to(v, (nblocks,))

        f_blocks = host_sample(freq_fn)
        r_blocks = host_sample(ratio_fn)

        base_freq = sr / self.wavelength
        rate = f_blocks / base_freq               # table frames/output frame
        starts = np.concatenate([[0.0], np.cumsum(rate * gran)])[:-1]
        local = np.arange(gran, dtype=np.float64)
        pos = (starts[:, None] + local[None, :] * rate[:, None]).reshape(-1)
        pos = pos[:out_frames]
        block_of = np.minimum(np.arange(out_frames) // gran, nblocks - 1)

        rows = []
        for channel in range(self.table.shape[0]):
            t_idx = self._ratio_to_table_index(r_blocks, channel)[block_of]
            left = np.floor(t_idx).astype(np.int64)
            right = np.minimum(left + 1, self.get_num_waveforms(channel) - 1)
            rem = jnp.asarray(t_idx - left, jnp.float32)

            p = jnp.asarray(np.mod(pos, self.wavelength), jnp.float32)
            base = jnp.floor(p).astype(jnp.int32)
            frac = p - base
            b1 = jnp.mod(base + 1, self.wavelength)
            tab = self.table[channel]

            def read(widx):
                w = jnp.asarray(widx, jnp.int32)
                lo = tab[w, base]
                hi = tab[w, b1]
                return lo * (1 - frac) + hi * frac

            s = read(left)
            if smooth:
                s = s * (1 - rem) + read(right) * rem
            rows.append(s)
        return Audio(data=jnp.stack(rows).astype(jnp.float32),
                     sample_rate=sr)

    # --- Observability (reference Wavetable.cpp:336-357) --------------------
    def graph_waveform_range(self, channel: int, start: int, num: int):
        """Stacked waveform plots of table entries [start, start+num)."""
        from flan_tpu.graph.graph import Graph, WaveformMode
        from flan_tpu.utils.geometry import Color, Rect
        g = Graph(-1, -1)
        if self.is_null():
            return g
        g.fill_image(Color.from_hsv(0, 0, 0.04))
        g.add_full_split_view_y(Rect(0, -1, 1, 1), num)
        rows = [np.asarray(self.table[channel, i])
                for i in range(start, start + num)
                if 0 <= i < self.get_num_waveforms(channel)]
        g.draw_waveforms(rows, Rect(0, -1, 1, 1), 0, WaveformMode.DIRECT)
        return g

    def save_waveform_range_to_bmp(self, filename: str, channel: int,
                                   start: int, num: int) -> None:
        self.graph_waveform_range(channel, start, num).save_image(filename)

    # --- Edit ops (reference Wavetable.cpp:364-451) -------------------------
    def add_fades_in_place(self, fade_frames: int = 32) -> None:
        env = _edge_fade_env(self.wavelength, fade_frames)
        self.table = self.table * env[None, None, :]

    def remove_jumps_in_place(self, fade_frames: int = 32) -> None:
        mid = (self.table[..., :1] + self.table[..., -1:]) / 2.0
        env = _edge_fade_env(self.wavelength, fade_frames)
        self.table = (self.table - mid) * env[None, None, :] + mid

    def remove_dc_in_place(self) -> None:
        self.table = self.table - jnp.mean(self.table, axis=-1,
                                           keepdims=True)

    def normalize_in_place(self) -> None:
        peak = jnp.max(jnp.abs(self.table), axis=-1, keepdims=True)
        self.table = jnp.where(peak < 1e-3, self.table,
                               self.table / jnp.maximum(peak, 1e-9))


def _edge_fade_env(wavelength: int, fade_frames: int) -> jnp.ndarray:
    """sin fade at both waveform edges (reference Wavetable.cpp:375-380)."""
    env = np.ones(wavelength, np.float32)
    for f in range(max(fade_frames - 1, 0)):
        fade = math.sin(math.pi / 2.0 * (f + 1) / fade_frames)
        env[f] *= fade
        env[wavelength - 1 - f] *= fade
    return jnp.asarray(env)


def _get_waveform_starts(source, snap_mode, pitch_mode, wavelength,
                         snap_ratio, fixed_frame) -> List[List[int]]:
    """Sequential pitch-following waveform segmentation
    (reference get_waveform_starts, Wavetable.cpp:134-218)."""
    if source.is_null() or fixed_frame < 1 or not (0 < snap_ratio < 0.95):
        return []
    lp = source.filter_1pole_lowpass(4000.0, 2)
    ac_gran = 128

    out = []
    for channel in range(source.num_channels):
        data = np.asarray(source.data[channel])
        local = np.zeros(0)
        global_wl = 0.0
        mode = pitch_mode
        if mode != PitchMode.NONE:
            local = np.asarray(lp.get_local_wavelengths(
                channel, 0, -1, wavelength, ac_gran, 1.0, 32))
            global_wl = lp.get_average_wavelength(local, 0.2, 64.0)
            if mode == PitchMode.GLOBAL and global_wl == -1:
                mode = PitchMode.NONE

        def snap(frame, src_frame, max_snap):
            if snap_mode == SnapMode.NONE:
                return int(frame)
            height = 0.0 if snap_mode == SnapMode.ZERO else float(
                data[int(np.clip(src_frame, 0, len(data) - 1))])
            return _snap_frame(data, int(frame), height, int(max_snap))

        starts = [snap(0, 0, snap_ratio * max(global_wl, 0))]
        while True:
            if mode == PitchMode.LOCAL:
                li = int(starts[-1] // ac_gran)
                if li >= len(local):
                    break
                wl = local[li]
                if wl > 0:
                    expected = wl
                elif global_wl > 0:
                    expected = global_wl
                else:
                    expected = fixed_frame
            elif mode == PitchMode.GLOBAL:
                expected = global_wl
            else:
                expected = fixed_frame
            expected = int(max(round(expected), 1))
            if starts[-1] + expected >= source.num_frames:
                break
            starts.append(snap(starts[-1] + expected, starts[-1],
                               snap_ratio * expected))
        out.append(starts)
    return out


def _resample_waveforms(source, waveform_starts, wavelength):
    """All waveforms -> fixed wavelength in one batched sinc gather
    (replaces the reference's per-waveform FFT loop,
    Wavetable.cpp:67-132)."""
    if source.is_null() or not waveform_starts:
        return None
    channels = []
    for channel, starts in enumerate(waveform_starts):
        if len(starts) < 2:
            channels.append(jnp.zeros((1, wavelength), jnp.float32))
            continue
        s = np.asarray(starts, np.float64)
        num_in = np.diff(s)                       # [W-1]
        grid = np.arange(wavelength, dtype=np.float64) / wavelength
        pos = (s[:-1, None] + grid[None, :] * num_in[:, None]).reshape(-1)
        cutoff = np.minimum(1.0, wavelength / np.maximum(num_in, 1e-9))
        cutoff = np.repeat(cutoff, wavelength)
        vals = fractional_gather(source.data[channel:channel + 1],
                                 jnp.asarray(pos, jnp.float32),
                                 jnp.asarray(cutoff, jnp.float32),
                                 num_taps=16)
        channels.append(vals.reshape(-1, wavelength))
    max_w = max(ch.shape[0] for ch in channels)
    padded = [jnp.pad(ch, [(0, max_w - ch.shape[0]), (0, 0)])
              for ch in channels]
    return jnp.stack(padded)
