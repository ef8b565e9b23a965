"""Spectrum: whole-signal complex-spectrum container.

The reference's Spectrum type is fully dormant - every line of
src/flan/Spectrum/Spectrum.h and SpectrumBuffer.cpp is commented out
(SURVEY.md component 14). This container mirrors what that code sketches
(a complex spectrum per channel with an inverse transform) so the slot
exists for future algorithms, matching the upstream state of one working
buffer layer and no algorithm layer.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Spectrum:
    """[channels, bins] complex spectrum of a whole signal."""
    data: jax.Array = field(
        default_factory=lambda: jnp.zeros((0, 0), jnp.complex64))
    sample_rate: float = dataclasses.field(
        default=48000.0, metadata=dict(static=True))

    @property
    def num_channels(self) -> int:
        return int(self.data.shape[0])

    @property
    def num_bins(self) -> int:
        return int(self.data.shape[1])

    def is_null(self) -> bool:
        return self.num_channels == 0 or self.num_bins == 0

    @staticmethod
    def from_audio(audio) -> "Spectrum":
        return Spectrum(data=jnp.fft.rfft(audio.data, axis=-1),
                        sample_rate=float(audio.sample_rate))

    def convert_to_audio(self):
        from flan_tpu.audio.audio import Audio
        if self.is_null():
            return Audio.create_null()
        return Audio(data=jnp.fft.irfft(self.data,
                                        axis=-1).astype(jnp.float32),
                     sample_rate=self.sample_rate)
