"""SPV: sliding-DFT phase vocoder (one spectral frame per audio sample).

TPU-native re-design of the reference SPV type
(reference: src/flan/SPV/SPVBuffer.h, SPV.cpp, Conversions/AudioSPV.cpp).
The reference already discovered the prefix-sum form of the sliding DFT
(AudioSPV.cpp:54-59); here the per-bin sequential sums become one cumsum
over the frame axis, the 3-tap hann spectral convolution is a vectorized
stencil, and phase vocoding reuses the batched lag-1-diff / mod-1-scan
machinery. Analysis rate equals the sample rate, so no phase wrapping is
needed (phase_vocoder.cpp:37).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from flan_tpu.func.function import as_function2d


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SPV:
    """Per-sample spectral data, SoA mag/freq [C, F, B]."""
    mag: jax.Array = field(
        default_factory=lambda: jnp.zeros((0, 0, 0), jnp.float32))
    freq: jax.Array = field(
        default_factory=lambda: jnp.zeros((0, 0, 0), jnp.float32))
    sample_rate: float = dataclasses.field(
        default=48000.0, metadata=dict(static=True))

    # --- Info (reference SPVBuffer.h) ---------------------------------------
    @property
    def num_channels(self) -> int:
        return int(self.mag.shape[0])

    @property
    def num_frames(self) -> int:
        return int(self.mag.shape[1])

    @property
    def num_bins(self) -> int:
        return int(self.mag.shape[2])

    @property
    def analysis_rate(self) -> float:
        return self.sample_rate

    @property
    def bin_width(self) -> float:
        return self.sample_rate / (2 * self.num_bins)

    def bin_to_frequency(self, b) -> float:
        return b * self.bin_width

    def frequency_to_bin(self, f) -> float:
        return f / self.bin_width

    def is_null(self) -> bool:
        return (self.num_channels == 0 or self.num_frames == 0
                or self.num_bins == 0 or self.sample_rate <= 0)

    def _with(self, **kwargs) -> "SPV":
        return dataclasses.replace(self, **kwargs)

    def copy(self) -> "SPV":
        return self._with()

    @staticmethod
    def create_null() -> "SPV":
        return SPV()

    # --- Algorithms (reference SPV.cpp:21-44) -------------------------------
    def modify_frequency(self, mod) -> "SPV":
        """Map each MF's frequency through mod(t, f)."""
        if self.is_null():
            return SPV.create_null()
        fn = as_function2d(mod)
        t = jnp.arange(self.num_frames,
                       dtype=jnp.float32)[None, :, None] / self.sample_rate
        tt = jnp.broadcast_to(t, self.freq.shape)
        new_freq = jnp.broadcast_to(
            jnp.asarray(fn(tt, self.freq), jnp.float32), self.freq.shape)
        return self._with(freq=new_freq)

    def repitch(self, factor) -> "SPV":
        fn = as_function2d(factor)
        return self.modify_frequency(lambda t, f: f * fn(t, f))

    # --- Conversions (reference AudioSPV.cpp:113-150) -----------------------
    def convert_to_audio(self):
        from flan_tpu.audio.audio import Audio
        if self.is_null():
            return Audio.create_null()
        data = spv_inverse(self.mag, self.freq, self.sample_rate)
        return Audio(data=data, sample_rate=self.sample_rate)

    def convert_to_lr_audio(self):
        return self.convert_to_audio().convert_to_left_right()


def _twiddle_powers(frames: int, nbins: int):
    """e^{-i pi j b / B} for j in frames, b in bins, with exact integer
    phase reduction mod 2B (the reference indexes a 2B twiddle table,
    AudioSPV.cpp:13-38)."""
    two_b = 2 * nbins
    j = jnp.arange(frames, dtype=jnp.int32) % two_b
    b = jnp.arange(nbins, dtype=jnp.int32)
    idx = (j[:, None] * b[None, :]) % two_b
    ang = -2.0 * jnp.pi / two_b * idx.astype(jnp.float32)
    return jnp.exp(1j * ang.astype(jnp.complex64))


@jax.jit
def _spv_forward_jit(x, twiddles, conj_next):
    c, n = x.shape
    nbins = twiddles.shape[1]
    # deltas: comb filter x[f] - x[f - 2B] (AudioSPV.cpp:47-52)
    two_b = 2 * nbins
    delayed = jnp.pad(x, [(0, 0), (two_b, 0)])[:, :n]
    deltas = x - delayed
    # fiddled prefix sum (AudioSPV.cpp:54-59)
    contrib = deltas[:, :, None] * twiddles[None, :, :]
    s = jnp.cumsum(contrib, axis=1)
    # rotate to the frame's reference phase: * conj(twiddle(f+1, b))
    f = s * conj_next[None, :, :]
    # 3-tap hann spectral convolution (AudioSPV.cpp:65-92)
    mid = 2.0 * f
    left = jnp.pad(f, [(0, 0), (0, 0), (1, 0)])[:, :, :nbins]
    right = jnp.pad(f, [(0, 0), (0, 0), (0, 1)])[:, :, 1:]
    # edge reflection uses real parts (AudioSPV.cpp:71-76, 85-90)
    left = left.at[:, :, 0].set(2.0 * jnp.real(f[:, :, 1]))
    right = right.at[:, :, -1].set(2.0 * jnp.real(f[:, :, -2]))
    conv = 0.25 * (mid - left - right) / (2.0 * nbins)
    return conv


def spv_forward(x: jnp.ndarray, nbins: int, sample_rate: float):
    """Audio [C, N] -> (mag, freq) [C, N, nbins] via sliding DFT + PV."""
    from flan_tpu.ops.stft import _wrap_radians
    c, n = x.shape
    twiddles = _twiddle_powers(n, nbins)
    conj_next = jnp.conj(_twiddle_powers(n + 1, nbins)[1:])
    spec = _spv_forward_jit(x, twiddles, conj_next)
    mag = jnp.abs(spec).astype(jnp.float32)
    phase = jnp.angle(spec).astype(jnp.float32)
    prev = jnp.pad(phase, [(0, 0), (1, 0), (0, 0)])[:, :n]
    bin_freq = (jnp.arange(nbins, dtype=jnp.float32)
                * (sample_rate / (2 * nbins)))
    expected = bin_freq / sample_rate * (2.0 * jnp.pi)
    # The reference skips wrapping when analysis_rate == sample_rate
    # (phase_vocoder.cpp:37), which leaves +-pi boundary crossings encoded
    # as freq +- sample_rate: mod-2pi-equivalent on resynthesis but wrong
    # under frequency arithmetic (repitch would scale the alias). Wrapping
    # costs nothing here - bin +- sr/2 covers the whole band at ar == sr -
    # so it is applied deliberately.
    delta = _wrap_radians(phase - prev - expected[None, None, :])
    freq = bin_freq[None, None, :] + delta * (sample_rate / (2.0 * jnp.pi))
    return mag, freq.astype(jnp.float32)


@jax.jit
def spv_inverse(mag: jnp.ndarray, freq: jnp.ndarray, sample_rate: float
                ) -> jnp.ndarray:
    """(mag, freq) [C, F, B] -> audio [C, F]: accumulate phase, then the
    alternating-sign real-part sum (reference AudioSPV.cpp:113-145)."""
    from flan_tpu.ops.stft import cumsum_mod1_frames
    c, f, b = mag.shape
    inc = jnp.mod(freq / sample_rate, 1.0)
    cycles = cumsum_mod1_frames(inc)
    phase = cycles * (2.0 * jnp.pi)
    real = mag * jnp.cos(phase)
    signs = jnp.where(jnp.arange(b) % 2 == 0, 1.0, -1.0)
    return (2.0 * jnp.sum(real * signs[None, None, :], axis=-1)
            ).astype(jnp.float32)
