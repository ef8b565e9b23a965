"""Sample-rate conversion kernels.

TPU-native replacements for the reference's two resampler dependencies
(SURVEY.md native-component checklist):

* r8brain whole-buffer SRC (reference src/r8brain/CDSPResampler.h:46, used by
  Audio::resample, AudioConversions.cpp:14-30) -> rational polyphase
  windowed-sinc resampling expressed as one XLA dilated/strided convolution,
  which maps onto the MXU/VPU instead of scalar polyphase loops.

* WDL streaming variable-rate SRC (reference src/WDL/resample.cpp, used by
  repitch / doppler / wavetable) -> time-varying fractional-delay
  resampling: the read-position curve is integrated (prefix sum), then the
  output is a dense gather of K-tap windowed-sinc interpolations, vectorized
  over all output frames.
"""
from __future__ import annotations

import functools
import math
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np


def _kaiser_beta(atten_db: float) -> float:
    if atten_db > 50:
        return 0.1102 * (atten_db - 8.7)
    if atten_db >= 21:
        return 0.5842 * (atten_db - 21) ** 0.4 + 0.07886 * (atten_db - 21)
    return 0.0


def design_lowpass(num_taps: int, cutoff: float, beta: float) -> np.ndarray:
    """Kaiser-windowed sinc FIR, cutoff in [0, 1] of Nyquist-normalized
    frequency (1 = Nyquist of the sampling rate the filter runs at)."""
    n = np.arange(num_taps, dtype=np.float64) - (num_taps - 1) / 2.0
    h = cutoff * np.sinc(cutoff * n)
    w = np.i0(beta * np.sqrt(np.clip(
        1 - (2 * n / (num_taps - 1)) ** 2, 0, 1))) / np.i0(beta)
    return (h * w).astype(np.float64)


@functools.cache
def _rational_filter(L: int, M: int, taps_per_phase: int,
                     atten_db: float) -> np.ndarray:
    """Anti-aliasing/anti-imaging filter for L/M rational resampling,
    designed at the upsampled rate L*sr with gain L."""
    cutoff = 1.0 / max(L, M)
    num_taps = taps_per_phase * L
    if num_taps % 2 == 0:
        num_taps += 1
    h = design_lowpass(num_taps, cutoff, _kaiser_beta(atten_db)) * L
    return h.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("L", "M", "num_out",
                                             "taps_per_phase", "atten_db"))
def _rational_resample_jit(x, L: int, M: int, num_out: int,
                           taps_per_phase: int, atten_db: float):
    h = jnp.asarray(_rational_filter(L, M, taps_per_phase, atten_db))
    k = h.shape[0]
    # conv with input dilation L, stride M == polyphase rational resampling.
    # Center the filter: output n taps upsampled position n*M; with SAME-
    # style padding of (k-1)/2 the filter is centered on the read position.
    pad = (k - 1) // 2
    # HIGHEST: DEFAULT TPU conv precision truncates f32 operands to bf16
    # (~40 dB SNR), defeating the 140 dB filter design; see ops/mxu_fft.py.
    y = jax.lax.conv_general_dilated(
        x[:, None, :], h[None, None, ::-1],
        window_strides=(M,), padding=[(pad, pad)], lhs_dilation=(L,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST)
    return y[:, 0, :num_out]


def resample(x: jnp.ndarray, sr_in: float, sr_out: float,
             taps_per_phase: int = 24, atten_db: float = 140.0,
             max_denominator: int = 1000) -> jnp.ndarray:
    """Whole-buffer SRC of [C, N] audio (r8brain equivalent).

    Output length matches the reference's truncation
    num_frames * sr_out / sr_in (AudioConversions.cpp:22).
    """
    if sr_in == sr_out:
        return x
    frac = Fraction(sr_out / sr_in).limit_denominator(max_denominator)
    L, M = frac.numerator, frac.denominator
    num_out = int(x.shape[-1] * (sr_out / sr_in))
    return _rational_resample_jit(x, L, M, num_out, taps_per_phase, atten_db)


@functools.partial(jax.jit, static_argnames=("num_taps",))
def fractional_gather(x: jnp.ndarray, positions: jnp.ndarray,
                      cutoff: jnp.ndarray, num_taps: int = 32) -> jnp.ndarray:
    """Windowed-sinc interpolation of [C, N] at fractional sample positions.

    positions: [num_out] read positions in input frames. cutoff: [num_out]
    per-output lowpass cutoff in (0, 1] (1 = input Nyquist) - pass
    min(1, 1/rate) to antialias downward pitch sweeps. This is the WDL
    variable-rate resampler equivalent: one dense gather + dot instead of a
    streaming filter. Positions outside the input read zeros.
    """
    c, n = x.shape
    num_out = positions.shape[0]
    base = jnp.floor(positions).astype(jnp.int32)
    frac = positions - base
    offs = jnp.arange(-(num_taps // 2 - 1), num_taps // 2 + 1)  # [K]
    idx = base[:, None] + offs[None, :]                          # [O, K]
    valid = (idx >= 0) & (idx < n)
    samples = jnp.take(x, jnp.clip(idx, 0, n - 1), axis=-1)      # [C, O, K]
    samples = jnp.where(valid[None], samples, 0.0)

    # Kaiser-windowed sinc taps evaluated at (offs - frac) * cutoff
    t = (offs[None, :] - frac[:, None]) * cutoff[:, None]        # [O, K]
    sinc = jnp.sinc(t) * cutoff[:, None]
    # polynomial Kaiser approx via cosine window (Blackman-Harris-ish) over
    # the tap span; cheap and >90 dB for 32 taps
    u = (offs[None, :] - frac[:, None]) / (num_taps / 2)
    u = jnp.clip(u, -1.0, 1.0)
    w = (0.35875 + 0.48829 * jnp.cos(jnp.pi * u)
         + 0.14128 * jnp.cos(2 * jnp.pi * u)
         + 0.01168 * jnp.cos(3 * jnp.pi * u))
    taps = sinc * w
    return jnp.einsum("cok,ok->co", samples, taps,
                      precision=jax.lax.Precision.HIGHEST)


def variable_rate_positions(rate_per_block: np.ndarray,
                            block_frames: int) -> np.ndarray:
    """Integrate per-block read rates into per-output-frame read positions.

    Mirrors the reference's blockwise WDL loop (AudioTemporal.cpp:267-296):
    each block of block_frames output frames advances the input read head at
    a constant rate. Host-side; the result feeds fractional_gather.
    """
    nblocks = len(rate_per_block)
    starts = np.concatenate(
        [[0.0], np.cumsum(rate_per_block.astype(np.float64))
         * block_frames])[:-1]
    local = np.arange(block_frames, dtype=np.float64)
    pos = starts[:, None] + local[None, :] * rate_per_block[:, None]
    return pos.reshape(-1)
