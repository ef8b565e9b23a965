"""SQPV: sliding constant-Q phase-vocoder buffer.

TPU-native port of the reference SQPVBuffer
(reference: src/flan/SQPV/SQPVBuffer.h:14-79, SQPVBuffer.cpp:17-31,
Utility/MP.h:9-33). As in the reference, only the buffer layer is live: the
algorithm layer above it (SQPV/SQPV.cpp, Conversions/AudioSQPV.cpp) is
entirely commented out upstream, so this type provides the container,
pitch/bin unit conversions, and Q math for interchange and future
algorithms.

Data is SoA: magnitude and *pitch* (log2 |frequency|) planes plus a sign
plane tracking negative frequencies (the reference packs a bool into its MP
struct for the same reason).
"""
from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SQPV:
    """Constant-Q spectral data: mag / pitch / sign [C, F, B]."""
    mag: jax.Array = field(
        default_factory=lambda: jnp.zeros((0, 0, 0), jnp.float32))
    pitch: jax.Array = field(
        default_factory=lambda: jnp.zeros((0, 0, 0), jnp.float32))
    positive: jax.Array = field(
        default_factory=lambda: jnp.ones((0, 0, 0), jnp.bool_))
    sample_rate: float = dataclasses.field(
        default=48000.0, metadata=dict(static=True))
    bins_per_octave: float = dataclasses.field(
        default=24.0, metadata=dict(static=True))
    bandwidth: Tuple[float, float] = dataclasses.field(
        default=(16.0, 24000.0), metadata=dict(static=True))

    # --- Info ----------------------------------------------------------------
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
    def q(self) -> float:
        """Cycles per analysis: 1 / (2^(1/bpo) - 1)
        (reference SQPVBuffer.cpp:22)."""
        return 1.0 / (2.0 ** (1.0 / self.bins_per_octave) - 1.0)

    def is_null(self) -> bool:
        return (self.num_channels == 0 or self.num_frames == 0
                or self.num_bins == 0 or self.sample_rate <= 0)

    # --- Unit conversions (reference SQPVBuffer.cpp) -------------------------
    def frequency_to_pitch(self, f) -> float:
        return math.log2(max(abs(f), 1e-12))

    def pitch_to_frequency(self, p) -> float:
        return 2.0 ** p

    @property
    def pitch_bandwidth(self) -> Tuple[float, float]:
        return (self.frequency_to_pitch(self.bandwidth[0]),
                self.frequency_to_pitch(self.bandwidth[1]))

    def pitch_to_bin(self, p) -> float:
        return (p - self.pitch_bandwidth[0]) * self.bins_per_octave

    def bin_to_pitch(self, b) -> float:
        return b / self.bins_per_octave + self.pitch_bandwidth[0]

    def frequency_to_bin(self, f) -> float:
        return self.pitch_to_bin(self.frequency_to_pitch(f))

    def bin_to_frequency(self, b) -> float:
        return self.pitch_to_frequency(self.bin_to_pitch(b))

    def bin_frequencies(self) -> np.ndarray:
        return np.asarray([self.bin_to_frequency(b)
                           for b in range(self.num_bins)])

    def get_period(self, b: int) -> int:
        """Frames per analysis at bin b: Q cycles at the bin frequency
        (reference SQPVBuffer getPeriod)."""
        return int(math.ceil(self.q / self.bin_to_frequency(b)
                             * self.sample_rate))

    def time_to_frame(self, t) -> float:
        return t * self.sample_rate

    def frame_to_time(self, f) -> float:
        return f / self.sample_rate

    @staticmethod
    def num_bins_for(bandwidth: Tuple[float, float],
                     bins_per_octave: float) -> int:
        """ceil(frequency_to_bin(top)) (reference SQPVBuffer.cpp:21)."""
        lo = math.log2(bandwidth[0])
        hi = math.log2(bandwidth[1])
        return int(math.ceil((hi - lo) * bins_per_octave))

    @staticmethod
    def create(num_channels: int, num_frames: int,
               bins_per_octave: float = 24.0,
               sample_rate: float = 48000.0,
               bandwidth: Tuple[float, float] = (16.0, 24000.0)) -> "SQPV":
        b = SQPV.num_bins_for(bandwidth, bins_per_octave)
        shape = (num_channels, num_frames, b)
        return SQPV(mag=jnp.zeros(shape, jnp.float32),
                    pitch=jnp.zeros(shape, jnp.float32),
                    positive=jnp.ones(shape, jnp.bool_),
                    sample_rate=sample_rate,
                    bins_per_octave=bins_per_octave, bandwidth=bandwidth)

    @staticmethod
    def create_null() -> "SQPV":
        return SQPV()

    def _with(self, **kwargs) -> "SQPV":
        return dataclasses.replace(self, **kwargs)
