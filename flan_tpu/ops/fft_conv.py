"""Overlap-save FFT convolution on the MXU transforms.

The reference computes full-length FFT convolution with one giant FFTW
transform (reference: src/flan/Audio/AudioCombination.cpp:299-353). On
this backend a single multi-million-point transform is the slow path
twice over: XLA's native TPU FFT runs at ~27 Gflops, and the matmul
Cooley-Tukey form (ops/mxu_fft.py) needs O(sqrt(n))-wide dense stage
matrices that grow unreasonable past ~2^18. Overlap-save fixes both:
the signal streams through power-of-two blocks sized to the impulse
response, every block's (i)rFFT is one *batched* MXU transform, and the
valid tails concatenate to the exact linear convolution. Measured round 3:
30 s stereo reverb went 623x -> see README; the granular-texture mix
(impulse-train convolution, AudioSynthesis.cpp:401-421 equivalent)
inherits the same win.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from flan_tpu.core.types import power_of_2_container

# largest block transform: at 2^18 the half-length complex FFT's dense
# Cooley-Tukey stage matrices are [512]^2/[1024]^2 blocks - still
# MXU-friendly - and the blocked batch stays VMEM-resident per block
_MAX_DFT = 1 << 18


def _plan(n: int, m: int):
    """Choose (dft, step, nblocks) for x-length n, ir-length m."""
    dft = max(4096, 2 * power_of_2_container(m))
    if dft > _MAX_DFT:
        return None  # ir too long for blocking; caller falls back
    step = dft - (m - 1)
    nblocks = -(-(n + m - 1) // step)
    return dft, step, nblocks


@jax.jit
def fft_convolve_full(x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Full linear convolution along the last axis: [C, n] conv [C, m]
    -> [C, n + m - 1] (callers pad/trim to their length conventions).

    Jitted at module level: the blocked form is ~100 primitives, and
    eager per-op dispatch through the remote TPU client measured 0.6 s
    where the compiled program runs 26 ms (round 3; the whole-signal XLA
    FFT pair measured 33.8 ms compiled). All control flow is shape-static
    so the jit caches per (n, m, C)."""
    from flan_tpu.ops.mxu_fft import irfft_mxu, rfft_mxu
    c, n = x.shape
    assert h.shape[0] == c, (x.shape, h.shape)
    m = h.shape[-1]
    if m > n:  # convolution commutes; block over the longer signal
        return fft_convolve_full(h, x)
    plan = _plan(n, m)
    if plan is None:
        # impulse response too long to block: one whole-signal transform
        dft = 2 * power_of_2_container(max(n, m))
        spec = (jnp.fft.rfft(x, n=dft, axis=-1)
                * jnp.fft.rfft(h, n=dft, axis=-1))
        return jnp.fft.irfft(spec, n=dft, axis=-1)[:, :n + m - 1]

    dft, step, nblocks = plan
    # overlap-save: pad m-1 zeros left; block i reads [i*step, i*step+dft)
    total = (nblocks - 1) * step + dft
    xp = jnp.pad(x, [(0, 0), (m - 1, total - (m - 1) - n)])
    blocks = jnp.stack(
        [jax.lax.slice(xp, (0, i * step), (c, i * step + dft))
         for i in range(nblocks)], axis=1)          # [C, nb, dft]

    hr, hi = rfft_mxu(h, dft)                        # [C, bins]
    xr, xi = rfft_mxu(blocks, dft)                   # [C, nb, bins]
    pr = xr * hr[:, None, :] - xi * hi[:, None, :]
    pi = xr * hi[:, None, :] + xi * hr[:, None, :]
    y = irfft_mxu(pr, pi, dft)                       # [C, nb, dft]
    # the first m-1 samples of each block alias (circular); keep the rest
    valid = y[:, :, m - 1:].reshape(c, nblocks * step)
    return valid[:, :n + m - 1]
