"""PV salience / contours / prism (Salamon & Gomez melody machinery).

TPU-native re-design of the reference melody extraction
(reference: src/flan/PV/PVInformation.cpp). The salience map runs on device
with per-frame top-K peak batching and one scatter-add; contour tracking is
greedy control flow over sparse peak lists (host, numpy); prism vectorizes
each contour's per-frame harmonic rewrites. Bound onto PV in
flan_tpu.pv.__init__.
"""
from __future__ import annotations

import dataclasses
import math
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from flan_tpu.ops.windows import hann

_NOTES_CLOSE_LO = 2.0 ** (-1.0 / 24.0)
_NOTES_CLOSE_HI = 2.0 ** (1.0 / 24.0)


@dataclasses.dataclass
class Salience:
    """(reference PV.h:131-137)"""
    num_frames: int = 0
    num_bins: int = 0
    buffer: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 0), np.float32))

    def get(self, frame: int, b: int) -> float:
        return float(self.buffer[frame, b])


@dataclasses.dataclass
class Contour:
    """(reference PV.h:153-162): bins holds (pitch_bin, salience) pairs."""
    pitch_mean: float = 0.0
    pitch_std_dev: float = 0.0
    salience_mean: float = 0.0
    salience_std_dev: float = 0.0
    start_frame: int = 0
    bins: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 2)))


def _hann_dft2(f):
    out = jnp.where(
        jnp.abs(f) < 1e-9, 1.0,
        jnp.where(jnp.abs(jnp.abs(f) - 1.0) < 1e-9, 0.5,
                  jnp.sin(jnp.pi * f)
                  / (jnp.pi * f * (1.0 - f * f) + 1e-30)))
    return out


def get_salience(self, channel: int, min_frequency: float = 55.0,
                 max_frequency: float = 1760.0, max_peaks: int = 64
                 ) -> Salience:
    """Perceived-pitch salience map (reference PVInformation.cpp:28-109):
    per-frame magnitude peaks, hann-DFT amplitude correction, subharmonic
    accumulation with cosine spreading. Peaks are capped at max_peaks per
    frame (the loudest win; the reference walks all)."""
    if self.is_null():
        return Salience()
    bin_effect_dist = 10
    nh = 20
    alpha = 0.8
    gamma = 40.0
    e_test = 10.0 ** (gamma / 20.0)
    log2_min = math.log2(min_frequency)
    sal_bins = int(round(120.0 * (math.log2(max_frequency) - log2_min)))

    mag = self.mag[channel]                      # [F, B]
    freq = self.freq[channel]
    f_cnt, b_cnt = mag.shape

    # strict local maxima (reference uses find_peaks without interpolation)
    mid = mag[:, 1:-1]
    is_peak = (mid > mag[:, :-2]) & (mid >= mag[:, 2:])
    peak_mask = jnp.pad(is_peak, [(0, 0), (1, 1)])
    a_max = jnp.max(mag, axis=-1, keepdims=True)
    peak_mask = peak_mask & (mag > a_max / e_test)

    vals, idxs = jax.lax.top_k(jnp.where(peak_mask, mag, -1.0), max_peaks)
    picked = vals > 0                             # [F, K]
    i_f = jnp.take_along_axis(freq, idxs, axis=-1)

    # instantaneous amplitude correction (PVInformation.cpp:82-87)
    bin_offset = i_f / self.bin_width - idxs
    kernel = _hann_dft2(bin_offset * self.window_size / self.dft_size)
    i_m = jnp.where(kernel >= 0.5, vals / jnp.maximum(kernel, 1e-9), 0.0)
    i_m = jnp.where(picked & (i_f > 0), i_m, 0.0)

    h = jnp.arange(1, nh + 1, dtype=jnp.float32)      # [Nh]
    alpha_pow = alpha ** jnp.arange(nh, dtype=jnp.float32)
    sub_f = i_f[..., None] / h[None, None, :]          # [F, K, Nh]
    b_c = jnp.round(120.0 * (jnp.log2(jnp.maximum(sub_f, 1e-9))
                             - log2_min)).astype(jnp.int32)
    offs = jnp.arange(-bin_effect_dist, bin_effect_dist + 1)
    g = 0.5 * (1.0 + jnp.cos(
        jnp.abs(offs) / bin_effect_dist * jnp.pi / 2.0))   # [21]

    target = b_c[..., None] + offs[None, None, None, :]    # [F, K, Nh, 21]
    contrib = (g[None, None, None, :] * alpha_pow[None, None, :, None]
               * i_m[..., None, None])
    valid = (b_c[..., None] >= 0) & (target >= 0) & (target < sal_bins) \
        & (i_f[..., None, None] > 0)
    frame_ix = jnp.broadcast_to(
        jnp.arange(f_cnt)[:, None, None, None], target.shape)
    sal = jnp.zeros((f_cnt, sal_bins), jnp.float32)
    sal = sal.at[frame_ix.reshape(-1),
                 jnp.clip(target, 0, sal_bins - 1).reshape(-1)].add(
        jnp.where(valid, contrib, 0.0).reshape(-1))
    peak = jnp.max(sal)
    sal = sal / jnp.where(peak > 0, peak, 1.0)
    return Salience(num_frames=f_cnt, num_bins=sal_bins,
                    buffer=np.asarray(sal))


def _frame_peaks(row: np.ndarray):
    """Interpolated local maxima of one salience frame, loudest first."""
    from flan_tpu.ops.dsp_utility import find_peaks
    return find_peaks(row, -1, True, True)


def get_contours(self, channel: int, min_frequency: float = 55.0,
                 max_frequency: float = 1760.0, filter_short: int = 30,
                 filter_quiet: float = 20.0) -> List[Contour]:
    """Greedy S+/S- contour tracking (reference
    PVInformation.cpp:111-263)."""
    t_plus = 0.9
    t_sigma = 0.9
    pitch_bin_cents = 10.0
    max_delta_pitch = 80.0
    max_gap = int(self.time_to_frame(0.1))

    sal = get_salience(self, channel, min_frequency, max_frequency)
    if sal.buffer.size == 0:
        return []
    nf = sal.num_frames

    s_plus: List[list] = []
    s_minus: List[list] = []
    for f in range(nf):
        peaks = _frame_peaks(sal.buffer[f])
        thresh = t_plus * sal.buffer[f].max()
        plus = [p for p in peaks if p[1] >= thresh]
        minus = [p for p in peaks if p[1] < thresh]
        s_plus.append([list(p) for p in plus])
        s_minus.append([list(p) for p in minus])

    all_plus = [p for f in s_plus for p in f]
    if not all_plus:
        return []
    ys = np.asarray([p[1] for p in all_plus])
    mean, sigma = ys.mean(), ys.std()
    global_thresh = mean - t_sigma * sigma
    for f in range(nf):
        keep, drop = [], []
        for p in s_plus[f]:
            (keep if p[1] >= global_thresh else drop).append(p)
        s_plus[f] = keep
        s_minus[f].extend(drop)

    delta = max_delta_pitch / pitch_bin_cents

    contours: List[Contour] = []
    while True:
        best_frame, best_val = -1, 0.0
        for f in range(nf):
            if s_plus[f] and s_plus[f][0][1] > best_val:
                best_val = s_plus[f][0][1]
                best_frame = f
        if best_frame < 0:
            break
        bins = [s_plus[best_frame].pop(0)]

        def extend(start, end, bins):
            step = 1 if end > start else -1
            current = bins[-1][0]
            gap = 0
            f = start
            while f != end and gap < max_gap:
                hit = next((p for p in s_plus[f]
                            if abs(p[0] - current) < delta), None)
                if hit is not None:
                    bins.append(hit)
                    current = hit[0]
                    s_plus[f].remove(hit)
                    gap = 0
                else:
                    hit = next((p for p in s_minus[f]
                                if abs(p[0] - current) < delta), None)
                    if hit is None:
                        break
                    bins.append(hit)
                    current = hit[0]
                    s_minus[f].remove(hit)
                    gap += 1
                f += step

        extend(best_frame - 1, -1, bins)
        start_frame = best_frame + 1 - len(bins)
        bins.reverse()
        extend(best_frame + 1, nf, bins)

        if len(bins) < filter_short:
            continue
        arr = np.asarray(bins)
        contours.append(Contour(
            pitch_mean=float(arr[:, 0].mean()),
            pitch_std_dev=float(arr[:, 0].std()),
            salience_mean=float(arr[:, 1].mean()),
            salience_std_dev=float(arr[:, 1].std()),
            start_frame=int(start_frame), bins=arr))

    if not contours:
        return []
    max_sal = max(c.salience_mean for c in contours)
    return [c for c in contours if c.salience_mean >= max_sal / filter_quiet]


def prism(self, prism_func, use_local_contour_time: bool = True):
    """Per-contour per-harmonic magnitude/frequency rewriting
    (reference PVInformation.cpp:265-421). prism_func(note_index, time,
    harmonic, base_freq, harmonic_mags) -> (mag, freq); harmonic_mags is
    the np array of all harmonic magnitudes for the frame."""
    from flan_tpu.pv.pv import PV
    if self.is_null():
        return PV.create_null()
    min_frequency, max_frequency = 55.0, 1760.0
    height = self.bin_to_frequency(self.num_bins - 1)
    b_cnt = self.num_bins

    out_mag = np.array(self.mag)
    out_freq = np.array(self.freq)
    src_mag = np.asarray(self.mag)
    src_freq = np.asarray(self.freq)

    for channel in range(self.num_channels):
        contours = get_contours(self, channel, min_frequency, max_frequency,
                                60, 20.0)
        if not contours:
            return PV.create_null()
        contours.sort(key=lambda c: c.start_frame)
        for ci, contour in enumerate(contours):
            for cf in range(len(contour.bins)):
                frame = contour.start_frame + cf
                if frame < 0 or frame >= self.num_frames:
                    continue
                approx = min_frequency * 2.0 ** (
                    contour.bins[cf][0] / 120.0)
                fr = src_freq[channel, frame]
                mg = src_mag[channel, frame]
                close = (fr > 0.01) & (fr / approx > _NOTES_CLOSE_LO) \
                    & (fr / approx < _NOTES_CLOSE_HI)
                tot = np.abs(mg[close]).sum()
                if tot == 0:
                    continue
                base = float((fr[close] * np.abs(mg[close])).sum() / tot)
                if base < 1.0:
                    continue
                nharm = int(height / base)
                if nharm < 1:
                    continue

                bins_to_change = []
                for h in range(nharm):
                    f_h = base * (h + 1)
                    c_bin = f_h / self.bin_width
                    lo = int(np.clip(c_bin - 10, 0, b_cnt - 1))
                    hi = int(np.clip(c_bin + 10, 0, b_cnt - 1))
                    window = np.arange(lo, hi + 1)
                    wf = fr[window]
                    sel = (wf > 0.01) & (wf / f_h > _NOTES_CLOSE_LO) \
                        & (wf / f_h < _NOTES_CLOSE_HI)
                    bins = window[sel]
                    bins_to_change.append(bins)
                    out_mag[channel, frame, bins] = 0.0

                max_bins = np.zeros(nharm, np.int64)
                max_mags = np.zeros(nharm, np.float32)
                for h in range(nharm):
                    bins = bins_to_change[h]
                    if len(bins) == 0:
                        continue
                    mb = bins[mg[bins].argmax()]
                    max_bins[h] = mb
                    mm = mg[mb]
                    max_mags[h] = mm if mm >= 0.01 else 0.0

                t_arg = self.frame_to_time(
                    cf if use_local_contour_time else frame)
                for h in range(nharm):
                    f_h = base * (h + 1)
                    new_m, new_f = prism_func(ci, t_arg, h + 1, base,
                                              max_mags)
                    if new_f < 0:
                        continue
                    if max_mags[h] != 0:
                        bins = bins_to_change[h]
                        new_max_bin = int(new_f / f_h * max_bins[h])
                        shift = new_max_bin - max_bins[h]
                        f_scale = new_f / f_h
                        m_scale = new_m / max_mags[h]
                        nb = bins + shift
                        ok = (nb >= 0) & (nb < b_cnt)
                        for bsrc, bdst in zip(bins[ok], nb[ok]):
                            sm = mg[bsrc] * m_scale
                            if out_mag[channel, frame, bdst] < sm:
                                out_mag[channel, frame, bdst] = sm
                                out_freq[channel, frame, bdst] = \
                                    fr[bsrc] * f_scale
                    else:
                        bw = 10.0
                        lo_f = new_f - bw / 2
                        hi_f = new_f + bw / 2
                        lo = int(max(0, math.ceil(lo_f / self.bin_width)))
                        hi = int(min(b_cnt - 1,
                                     math.floor(hi_f / self.bin_width)))
                        for bdst in range(lo, hi + 1):
                            pos = (bdst * self.bin_width - lo_f) / bw
                            out_mag[channel, frame, bdst] = new_m * float(
                                0.5 * (1 - math.cos(2 * math.pi * pos)))
                            out_freq[channel, frame, bdst] = new_f
    return self._with(mag=jnp.asarray(out_mag), freq=jnp.asarray(out_freq))
