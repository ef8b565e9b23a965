"""Matmul-formulated FFTs for the MXU.

XLA's TPU FFT lowering runs at ~27 Gflops on this chip (9.4 us per
4096-point transform) - two orders of magnitude below the MXU's matmul
throughput. For power-of-two sizes used by the phase vocoder, a two-stage
Cooley-Tukey factorization n = a*b turns each (i)rFFT into a pair of small
dense DFT matmuls plus a twiddle multiply, all expressed in real arithmetic
(large 1-D complex ops are unimplemented on this backend; see
flan_tpu.audio.filters).

rfft_mxu/irfft_mxu are drop-in (batched, last axis) replacements validated
against numpy to float32 precision in tests/test_mxu_fft.py.

Derivation (decimation in time), n = a*b, input index n1*b + n2, output
index k1 + a*k2 with n1,k1 in [0,a), n2,k2 in [0,b):
    stage 1: A[n2, k1] = sum_n1 x[n1*b + n2] * Wa^(n1*k1)     (DFT-a)
    twiddle: B[n2, k1] = A[n2, k1] * Wn^(n2*k1)
    stage 2: X[k1 + a*k2] = sum_n2 B[n2, k1] * Wb^(n2*k2)     (DFT-b)
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

# TPU matmuls at DEFAULT precision truncate f32 operands to bfloat16
# (~8 mantissa bits), which degrades FFT output to ~51 dB SNR on real
# hardware (fine on CPU where DEFAULT is full f32 - which is why tests
# alone never caught it). Measured on one v5e chip, 4096-point rfft of
# [4, 256] frames vs numpy: DEFAULT 51.3 dB / 7.2 ms, HIGH (bf16x3 passes)
# 94.2 dB / 6.5 ms, HIGHEST (full f32, 6 passes) 138.1 dB / 9.8 ms.
# HIGH clears the >90 dB target at 2/3 the HIGHEST cost, so it is the
# default; flip to HIGHEST for measurement-grade transforms.
_PRECISION = jax.lax.Precision.HIGH


def _split(n: int):
    """Factor n = a*b with a, b near sqrt(n) (both powers of two)."""
    a = 1 << (int(math.log2(n)) // 2)
    return a, n // a


@functools.cache
def _matrices_np(n: int):
    a, b = _split(n)
    n1 = np.arange(a)
    k1 = np.arange(a)
    dft_a = np.exp(-2j * np.pi * np.outer(n1, k1) / a)        # [n1, k1]
    n2 = np.arange(b)
    k2 = np.arange(b)
    dft_b = np.exp(-2j * np.pi * np.outer(n2, k2) / b)        # [n2, k2]
    tw = np.exp(-2j * np.pi * np.outer(n2, np.arange(a)) / n)  # [n2, k1]
    f32 = lambda m: np.ascontiguousarray(m.astype(np.float32))
    return (f32(dft_a.real), f32(dft_a.imag), f32(dft_b.real),
            f32(dft_b.imag), f32(tw.real), f32(tw.imag))


def _matrices(n: int):
    # numpy is cached; conversion happens per trace so no tracer leaks
    return tuple(jnp.asarray(m) for m in _matrices_np(n))


def _fft_full_real_input(x: jnp.ndarray, n: int):
    """Full complex DFT of real x [..., n] -> (re, im) each [..., n],
    output index k1 + a*k2."""
    a, b = _split(n)
    ar, ai, br, bi, twr, twi = _matrices(n)
    xs = x.reshape(x.shape[:-1] + (a, b))           # [..., n1, n2]
    # stage 1 over n1: A[n2, k1]
    s1r = jnp.einsum("...nm,nk->...mk", xs, ar,
                     preferred_element_type=jnp.float32,
                     precision=_PRECISION)
    s1i = jnp.einsum("...nm,nk->...mk", xs, ai,
                     preferred_element_type=jnp.float32,
                     precision=_PRECISION)
    # twiddle [n2, k1]
    t_r = s1r * twr - s1i * twi
    t_i = s1r * twi + s1i * twr
    # stage 2 over n2: X[k1, k2]
    xr = (jnp.einsum("...mk,ml->...kl", t_r, br,
                     preferred_element_type=jnp.float32,
                     precision=_PRECISION)
          - jnp.einsum("...mk,ml->...kl", t_i, bi,
                       preferred_element_type=jnp.float32,
                     precision=_PRECISION))
    xi = (jnp.einsum("...mk,ml->...kl", t_r, bi,
                     preferred_element_type=jnp.float32,
                     precision=_PRECISION)
          + jnp.einsum("...mk,ml->...kl", t_i, br,
                       preferred_element_type=jnp.float32,
                     precision=_PRECISION))
    # output index k = k1 + a*k2 -> [..., k2, k1] reshape gives k-major
    xr = jnp.swapaxes(xr, -1, -2).reshape(x.shape[:-1] + (n,))
    xi = jnp.swapaxes(xi, -1, -2).reshape(x.shape[:-1] + (n,))
    return xr, xi


def rfft_mxu(x: jnp.ndarray, n: int):
    """Real FFT of x [..., m] zero-padded/truncated to n; returns
    (re, im) of bins [..., n//2 + 1]."""
    m = x.shape[-1]
    if m < n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - m)])
    elif m > n:
        x = x[..., :n]
    re, im = _fft_full_real_input(x, n)
    return re[..., : n // 2 + 1], im[..., : n // 2 + 1]


def irfft_mxu(re: jnp.ndarray, im: jnp.ndarray, n: int) -> jnp.ndarray:
    """Inverse real FFT from hermitian half-spectrum (re, im)
    [..., n//2+1] -> real [..., n].

    Uses conj symmetry: x = (1/n) * Re(DFT(conj(spectrum))) where the full
    spectrum is rebuilt by mirroring; the forward machinery is reused on
    the real and imaginary planes separately:
        x[t] = (1/n) [ DFT(Re S)[t]_re + DFT(Im S)[t]_im ]  ... derived:
    ifft(S)[t] = (1/n) conj(DFT(conj(S)))[t]; for real output
    x = (1/n) (C[t] + D[t]) with C = DFT(Sr)_re, D = DFT(Si)_im.
    """
    nbins = n // 2 + 1
    # rebuild full spectrum by hermitian mirror
    mid_r = re[..., 1:-1]
    mid_i = im[..., 1:-1]
    full_r = jnp.concatenate([re, mid_r[..., ::-1]], axis=-1)
    full_i = jnp.concatenate([im, -mid_i[..., ::-1]], axis=-1)
    # DFT of the real plane and of the imaginary plane
    cr, ci = _fft_full_real_input(full_r, n)
    dr, di = _fft_full_real_input(full_i, n)
    # ifft real part: (1/n) * (Re DFT(Sr) + Im DFT(Si)) evaluated with the
    # forward kernel (W^-1 = conj): Re part uses +, derived via
    # x[t] = (1/n) sum_k (Sr + i Si) W^{+tk}; W^{+tk} = conj(W^{-tk})
    # Re x[t] = (1/n) sum_k [Sr cos(2pi tk/n) - Si sin(2pi tk/n)]
    #          = (1/n) (cr[t] + di[t])
    return (cr + di) / n
