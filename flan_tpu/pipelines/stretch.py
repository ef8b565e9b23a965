"""Fused streaming PV time-stretch: audio -> audio without materializing PV.

The unfused path (convert_to_PV -> stretch -> convert_to_audio) materializes
phase-vocoder data that is overlap-factor x 2 larger than the audio: a
10-minute stereo 48 kHz file becomes ~15 GB of PV tensors - beyond one
v5e's HBM (the reference materializes the same data in host RAM,
PVBuffer.h:27). This pipeline instead streams output chunks through one
lax.scan:

    per output chunk: slice the needed audio span from HBM (one
      dynamic_slice; analysis frames are built with static hop-strided
      reshapes, never a data-dependent gather)
      -> windowed rFFT -> phase vocode (prev-phase recomputed locally, no
         carry needed in the forward direction)
      -> monotonic stretch gather (pair indices precomputed outside the
         scan; in-chunk gathers touch only chunk-local arrays)
      -> mod-1 cycle accumulation (carried across chunks)
      -> irFFT -> overlap-add (tail carried across chunks)

Peak HBM is O(chunk) regardless of file length; FLOPs are identical to the
unfused path. Numerically equivalent to
Audio.convert_to_PV().stretch(f).convert_to_audio() for monotonic maps
(validated in tests/test_pipeline.py).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from flan_tpu.ops.stft import _cdiv, _wrap_radians, num_hops
from flan_tpu.ops.windows import hann_window


@functools.partial(
    jax.jit,
    static_argnames=("window_size", "hop", "dft_size", "sample_rate",
                     "out_frames", "max_hops_per_chunk", "chunk_out"))
def _stretch_scan(x, time_map, *, window_size, hop, dft_size, sample_rate,
                  out_frames, max_hops_per_chunk, chunk_out):
    c, n = x.shape
    nh = time_map.shape[0]
    nbins = dft_size // 2 + 1
    analysis_rate = sample_rate / hop

    window = hann_window(window_size)
    bin_freq = (jnp.arange(nbins, dtype=jnp.float32)
                * (sample_rate / dft_size))
    expected = bin_freq / analysis_rate * (2.0 * jnp.pi)

    wpad = _cdiv(window_size, hop) * hop
    wblocks = wpad // hop
    r = wblocks
    inv_scale = 2.67 / (dft_size * window_size / hop) * dft_size
    inv_window = jnp.zeros((wpad,), jnp.float32).at[:window_size].set(
        hann_window(window_size) * inv_scale)

    nchunks = _cdiv(out_frames, chunk_out)
    H = max_hops_per_chunk
    fpad = nchunks * chunk_out

    # ---- one-time precompute over ALL output frames (no per-chunk
    #      big-array gathers inside the scan) ----
    xs = jnp.arange(fpad, dtype=jnp.float32)
    idx = jnp.clip(jnp.searchsorted(time_map, xs, side="right"), 1, nh - 1)
    l = time_map[idx - 1]
    rr = time_map[idx]
    mix = jnp.clip((xs - l) / jnp.where(rr == l, 1.0, rr - l), 0.0, 1.0)
    valid = (xs < out_frames) & (xs >= time_map[0]) \
        & (xs < time_map[nh - 1])
    i0 = idx.reshape(nchunks, chunk_out)[:, 0] - 1       # [nchunks]
    li = (idx.reshape(nchunks, chunk_out)
          - 1 - i0[:, None])                             # chunk-local pairs
    li = jnp.clip(li, 0, H - 3).astype(jnp.int32)
    mix_s = mix.reshape(nchunks, chunk_out)
    valid_s = valid.reshape(nchunks, chunk_out)

    # pad audio so every chunk's span is a clean dynamic_slice:
    # hop j of chunk starts reading at (i0-1+j)*hop - window/2
    left_pad = wpad + hop
    span_len = (H + wblocks + 1) * hop
    right_pad = span_len + left_pad
    xp = jnp.pad(x, [(0, 0), (left_pad, right_pad)])
    span_start = (i0 - 1) * hop - (window_size // 2) + left_pad  # >= 0

    def body(carry, inputs):
        cycle0, tail = carry
        s0, i0_c, li_c, mix_c, valid_c = inputs

        # ---- framing via one dynamic_slice + static strided restack ----
        span = jax.lax.dynamic_slice(xp, (0, s0), (c, span_len))
        rows = span.reshape(c, span_len // hop, hop)
        # frame j (hop i0-1+j) = rows[j : j+wblocks] flattened, first
        # window_size samples
        frames = jnp.stack(
            [rows[:, jj:jj + H, :] for jj in range(wblocks)],
            axis=2)                                  # [C, H, wblocks, hop]
        frames = frames.reshape(c, H, wblocks * hop)[..., :window_size]
        frames = frames * window[None, None, :]

        from flan_tpu.ops.stft import rfft_mag_phase
        mag, phase = rfft_mag_phase(frames, dft_size)  # [C, H, B]
        prev = jnp.concatenate(
            [jnp.zeros((c, 1, nbins), jnp.float32), phase[:, :-1]], axis=1)
        # hops whose predecessor lies before the signal use the zero
        # initial phase, matching pv_forward's phase-buffer init
        # (reference AudioPV.cpp:44); the hop -1 helper row overlaps the
        # signal start, so its phase must not leak in as a predecessor.
        hop_ids = i0_c - 1 + jnp.arange(H)
        prev = jnp.where((hop_ids[None, :, None] - 1) < 0, 0.0, prev)
        delta = _wrap_radians(phase - prev - expected[None, None, :])
        freq = bin_freq[None, None, :] + delta * (analysis_rate
                                                   / (2.0 * jnp.pi))
        mag = mag[:, 1:]      # drop the prev-phase helper hop
        freq = freq[:, 1:]

        # ---- stretch gather (chunk-local; WFS policy,
        #      PVModify.cpp:344-355) ----
        w0 = (1.0 - mix_c)[None, :, None] * mag[:, li_c]
        w1 = mix_c[None, :, None] * mag[:, li_c + 1]
        total = w0 + w1
        fsum = w0 * freq[:, li_c] + w1 * freq[:, li_c + 1]
        s_mag = jnp.where(valid_c[None, :, None], total, 0.0)
        s_freq = jnp.where(valid_c[None, :, None] & (total > 0.0),
                           fsum / jnp.where(total > 0.0, total, 1.0), 0.0)

        # ---- inverse PV (mod-1 cycle accumulation, carried) ----
        from flan_tpu.ops.stft import cumsum_mod1_frames
        inc = jnp.mod(s_freq / analysis_rate, 1.0)
        cycles = cumsum_mod1_frames(inc)
        cycles = jnp.mod(cycles + cycle0[:, None, :], 1.0)
        from flan_tpu.ops.stft import irfft_polar
        out_frames_t = irfft_polar(
            s_mag, cycles * (2.0 * jnp.pi), dft_size)[..., :wpad]
        out_frames_t = out_frames_t * inv_window[None, None, :]

        blocks = out_frames_t.reshape(c, chunk_out, r, hop)
        acc = jnp.zeros((c, chunk_out + r, hop), jnp.float32)
        acc = acc.at[:, :r, :].set(tail)
        for j in range(r):
            acc = acc.at[:, j:j + chunk_out, :].add(blocks[:, :, j, :])
        out = acc[:, :chunk_out, :].reshape(c, chunk_out * hop)
        new_tail = acc[:, chunk_out:, :]
        return (cycles[:, -1, :], new_tail), out

    init = (jnp.zeros((c, nbins), jnp.float32),
            jnp.zeros((c, r, hop), jnp.float32))
    (_, tail), outs = jax.lax.scan(
        body, init, (span_start, i0, li, mix_s, valid_s))
    body_audio = outs.transpose(1, 0, 2).reshape(c, fpad * hop)
    audio = jnp.concatenate([body_audio, tail.reshape(c, r * hop)], axis=-1)
    shift = window_size // 2
    return audio[:, shift:shift + out_frames * hop]


def pv_stretch_pipeline(x: jnp.ndarray, factor, *, window_size: int = 2048,
                        hop: int = 128, dft_size: int = 4096,
                        sample_rate: float = 48000.0,
                        chunk_out: int = 256) -> jnp.ndarray:
    """Stream audio [C, N] through PV stretch by `factor` (positive float or
    Function of time returning positive factors)."""
    from flan_tpu.func.function import as_function
    c, n = x.shape
    nh = num_hops(n, hop)
    fn = as_function(factor)
    if fn.is_constant:
        factors = np.full(nh, fn.constant_value, np.float64)
    else:
        t = np.arange(nh, dtype=np.float64) * (hop / sample_rate)
        factors = np.asarray(fn(jnp.asarray(t, jnp.float32)),
                             np.float64).reshape(-1)
    if (factors <= 0).any():
        raise ValueError("stretch pipeline requires positive factors")
    time_map = np.cumsum(factors)
    out_frames = int(math.ceil(time_map.max()))
    chunk_out = min(chunk_out, max(out_frames, 1))

    # static bound on input hops any output chunk can touch (+1 for the
    # local prev-phase hop, +margin for clipping)
    min_factor = float(factors.min())
    max_hops = int(math.ceil(chunk_out / min_factor)) + 4

    return _stretch_scan(
        x, jnp.asarray(time_map, jnp.float32), window_size=window_size,
        hop=hop, dft_size=dft_size, sample_rate=float(sample_rate),
        out_frames=out_frames, max_hops_per_chunk=max_hops,
        chunk_out=chunk_out)
