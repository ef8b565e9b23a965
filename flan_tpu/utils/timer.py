"""Timer: wall-clock stopwatch + device-honest timing helper.

TPU-native port of the reference Timer (reference: src/flan/Utility/Timer.h)
plus the lesson this environment teaches: JAX dispatch is asynchronous and
block_until_ready may not block through remote transports, so device timing
must force a small host fetch (SURVEY.md section 5 suggests jax profiler
traces; `time_jax` is the quick equivalent of the reference's manual
"ms per call" helper, tests/flanTest.cpp:59-68).
"""
from __future__ import annotations

import time
from typing import Callable


class Timer:
    """Chrono-style stopwatch (reference Utility/Timer.h)."""

    def __init__(self):
        self._start = None
        self._elapsed = 0.0

    def start(self) -> None:
        self._start = time.perf_counter()

    def stop(self) -> float:
        if self._start is not None:
            self._elapsed += time.perf_counter() - self._start
            self._start = None
        return self._elapsed

    def reset(self) -> None:
        self._start = None
        self._elapsed = 0.0

    @property
    def elapsed(self) -> float:
        if self._start is not None:
            return self._elapsed + (time.perf_counter() - self._start)
        return self._elapsed


def sync(tree) -> None:
    """Force completion of device work, robust to remote transports."""
    import jax
    import jax.numpy as jnp
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
            flat = jnp.ravel(leaf)
            float(jnp.sum(flat[:: max(1, flat.shape[0] // 4)][:4]))


def time_jax(fn: Callable, *args, reps: int = 3, warmup: int = 1) -> float:
    """Best-of-reps wall time of fn(*args) with honest device barriers."""
    for _ in range(warmup):
        sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best
