"""Spectrum: whole-signal complex-spectrum container.

The reference's Spectrum type is fully dormant - every line of
src/flan/Spectrum/Spectrum.h and SpectrumBuffer.cpp is commented out
(SURVEY.md component 14). Like the SQPV activation, this module goes
beyond matching the dormant state: the container plus every method the
commented code sketches is live - convert_to_audio and multiply
(Spectrum.h:14,18), bin/frequency maps and the max-magnitude query
(SpectrumBuffer.h:33-36). One deliberate deviation: the sketch's
FFTW c2r inverse is unnormalized (output scaled by 2*(bins-1), an
artifact of FFTW plan semantics, Spectrum.cpp:31); convert_to_audio
uses the normalized inverse so from_audio round-trips to identity.
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
        if audio.is_null():
            # null-propagate: XLA's FFT cannot lower a 0-length axis
            return Spectrum(sample_rate=float(audio.sample_rate))
        return Spectrum(data=jnp.fft.rfft(audio.data, axis=-1),
                        sample_rate=float(audio.sample_rate))

    def convert_to_audio(self):
        """Normalized inverse rFFT to 2*(bins-1) samples per channel
        (reference sketch: Spectrum.cpp:10-43, see module docstring for
        the normalization deviation)."""
        from flan_tpu.audio.audio import Audio
        if self.is_null():
            return Audio.create_null()
        return Audio(data=jnp.fft.irfft(self.data,
                                        axis=-1).astype(jnp.float32),
                     sample_rate=self.sample_rate)

    def frequency_to_bin(self) -> float:
        """Bins per Hz, exactly the sketched scalar num_bins/sample_rate
        (SpectrumBuffer.cpp:45-48)."""
        return float(self.num_bins) / float(self.sample_rate)

    def bin_to_frequency(self) -> float:
        """Hz per bin - reciprocal of frequency_to_bin
        (SpectrumBuffer.cpp:41-44)."""
        return 1.0 / self.frequency_to_bin()

    def get_max_spectra_magnitude(self) -> float:
        """Largest |bin| over all channels (SpectrumBuffer.cpp:49-54)."""
        if self.is_null():
            return 0.0
        return float(jnp.max(jnp.abs(self.data)))

    def multiply(self, filter: "Spectrum") -> "Spectrum":
        """Bin-wise complex product - spectral filtering, the algorithm
        sketched at Spectrum.h:18. A mono filter broadcasts over this
        spectrum's channels; bin counts must match."""
        if self.is_null() or filter.is_null():
            return Spectrum(sample_rate=self.sample_rate)
        if filter.num_bins != self.num_bins:
            raise ValueError(
                f"bin count mismatch: {self.num_bins} vs "
                f"{filter.num_bins}")
        if filter.num_channels not in (1, self.num_channels):
            raise ValueError(
                f"channel count mismatch: {self.num_channels} vs "
                f"{filter.num_channels}")
        return Spectrum(data=self.data * filter.data,
                        sample_rate=self.sample_rate)
