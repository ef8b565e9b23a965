"""Window functions (reference: src/flan/WindowFunctions.cpp:10).

The reference implements only a symmetric hann window evaluated at
i / (window_size - 1).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def hann(x):
    """Hann window function on [0, 1]: 0.5 * (1 - cos(2 pi x))."""
    return 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * x))


def hann_window(window_size: int, dtype=jnp.float32) -> jnp.ndarray:
    """Symmetric hann window of length window_size.

    Matches the reference's sampling hann(i / (window_size - 1))
    (reference: Conversions/AudioPV.cpp:30-34).
    """
    if window_size == 1:
        return jnp.ones((1,), dtype)
    i = np.arange(window_size, dtype=np.float64) / (window_size - 1)
    return jnp.asarray(0.5 * (1.0 - np.cos(2.0 * np.pi * i)), dtype)
