"""Matmul-formulated FFTs for the MXU.

XLA's TPU FFT lowering runs at ~27 Gflops on this chip (9.4 us per
4096-point transform) - two orders of magnitude below the MXU's matmul
throughput. For the even sizes used by the phase vocoder, each (i)rFFT is
computed as a half-length complex FFT (even/odd packing) whose two
Cooley-Tukey stages are *block-complex* matmuls, all in real arithmetic
(large 1-D complex ops are unimplemented on this backend; see
flan_tpu.audio.filters).

Design notes (round 2 headline rework):

* Block-complex matmul: a complex product Z = X W is one real einsum
  [..., 2K] x [2K, 2N] with W packed as [[Wr, Wi], [-Wi, Wr]] instead of
  four real einsums. For n=4096 (m=2048, a=64) the stage-1 block matrix is
  exactly [128, 128] - a perfect MXU tile - where the previous four-einsum
  form ran 64-wide contractions that padded 4x on the systolic array.

* Even/odd packing: rfft of real x[0..n) = complex FFT of
  z[j] = x[2j] + i x[2j+1] of length m = n/2 plus an O(n) elementwise
  untangle (the standard split: X[k] = E[k] + W^k O[k] with
  E = (Z[k]+conj(Z[m-k]))/2, O = (Z[k]-conj(Z[m-k]))/2i). The irfft is the
  exact mirror (repack bins into Z, inverse complex FFT, deinterleave).
  Halves the transform length on top of the block-matmul win; measured
  together they cut the padded MXU work ~8x per frame vs the round-1 form.

rfft_mxu/irfft_mxu are drop-in (batched, last axis) replacements validated
against numpy to float32 precision in tests/test_mxu_fft.py.

Two-stage Cooley-Tukey derivation (decimation in time), m = a*b, input
index n1*b + n2, output index k1 + a*k2 with n1,k1 in [0,a), n2,k2 in [0,b):
    stage 1: A[n2, k1] = sum_n1 z[n1*b + n2] * Wa^(n1*k1)     (DFT-a)
    twiddle: B[n2, k1] = A[n2, k1] * Wm^(n2*k1)
    stage 2: Z[k1 + a*k2] = sum_n2 B[n2, k1] * Wb^(n2*k2)     (DFT-b)
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
# alone never caught it). Measured on one v5e chip, 4096-point transforms
# of [4, 256] frames vs numpy at HIGH (bf16x3 passes): 95.4 dB SNR both
# directions in the block-complex form (round-1 four-einsum form: DEFAULT
# 51.3 dB, HIGH 94.2 dB, HIGHEST 138.1 dB at 1.5x the HIGH cost). HIGH
# clears the >90 dB target; flip to HIGHEST for measurement-grade
# transforms.
_PRECISION = jax.lax.Precision.HIGH


def _split(n: int):
    """Factor n = a*b with the power-of-two a near sqrt(n).

    When no such a divides n (odd n, or sizes like 5 whose power-of-two
    near-sqrt doesn't divide them), falls back to (1, n): stage 1 becomes
    the identity and stage 2 a dense DFT-n - correct for every n, just not
    MXU-tiled. All phase-vocoder sizes are powers of two."""
    a = 1 << (int(math.log2(n)) // 2)
    while a > 1 and n % a:
        a >>= 1
    return a, n // a


def _block(mr: np.ndarray, mi: np.ndarray) -> np.ndarray:
    """Real block form of a complex matrix: [x_r x_i] @ block = [z_r z_i]
    stacked along the contraction axis."""
    top = np.concatenate([mr, mi], axis=1)
    bot = np.concatenate([-mi, mr], axis=1)
    return np.concatenate([top, bot], axis=0).astype(np.float32)


@functools.cache
def _cfft_mats_np(m: int, inverse: bool):
    """Block stage matrices + twiddles for a complex FFT of length m.

    The inverse uses conjugated matrices with the 1/m normalization folded
    into the stage-2 matrix (a free rescale of constant weights).
    """
    a, b = _split(m)
    s = 2j * np.pi if inverse else -2j * np.pi
    dft_a = np.exp(s * np.outer(np.arange(a), np.arange(a)) / a)
    dft_b = np.exp(s * np.outer(np.arange(b), np.arange(b)) / b)
    if inverse:
        dft_b = dft_b / m
    tw = np.exp(s * np.outer(np.arange(b), np.arange(a)) / m)  # [n2, k1]
    f32 = lambda x: np.ascontiguousarray(x.astype(np.float32))
    return (_block(dft_a.real, dft_a.imag), _block(dft_b.real, dft_b.imag),
            f32(tw.real), f32(tw.imag))


# Below this length the complex FFT runs as ONE dense block matmul
# ([2m, 2m], perfect MXU tiles, no twiddle/concat/transpose stages):
# the two-stage split of small m produces sub-128 contraction/lane dims
# whose padding + relayout costs exceed the dense form's extra MACs
# (4m^2 exact vs ~m*(a+b) padded-to-128; crossover measured on the v5e).
_DENSE_MAX = 512


@functools.cache
def _dense_mats_np(m: int, inverse: bool):
    s = 2j * np.pi if inverse else -2j * np.pi
    w = np.exp(s * np.outer(np.arange(m), np.arange(m)) / m)
    if inverse:
        w = w / m
    return _block(w.real, w.imag)                    # [2m, 2m]


def _cfft(zr: jnp.ndarray, zi: jnp.ndarray, m: int, inverse: bool,
          n1_rows: int = 0, k2_cols: int = 0):
    """Complex FFT of (zr, zi) [..., m] -> (Zr, Zi) [..., m].

    n1_rows > 0: the input is known zero beyond the first n1_rows stage-1
    rows (zr/zi arrive trimmed to [..., n1_rows * b]) - the stage-1 matrix
    drops the dead rows, halving input traffic for half-zero signals
    (analysis frames zero-padded from window_size to dft_size).
    k2_cols > 0: only output indices k = k1 + a*k2 with k2 < k2_cols are
    needed (output truncated to a*k2_cols) - the stage-2 matrix drops the
    dead columns.
    """
    if m <= _DENSE_MAX and not n1_rows and not k2_cols:
        # the dense form takes full-length input and emits full output;
        # the (currently unused) trim contracts stay on the staged path
        wb = jnp.asarray(_dense_mats_np(m, inverse))
        xb = jnp.concatenate([zr, zi], axis=-1)      # [..., 2m]
        out = jnp.einsum("...n,nk->...k", xb, wb,
                         preferred_element_type=jnp.float32,
                         precision=_PRECISION)
        return out[..., :m], out[..., m:]
    a, b = _split(m)
    ablk, bblk, twr, twi = (jnp.asarray(x) for x in _cfft_mats_np(m, inverse))
    rows = n1_rows if n1_rows else a
    if rows < a:  # trim dead stage-1 rows (zero input region)
        ablk = jnp.concatenate([ablk[:rows], ablk[a:a + rows]], axis=0)
    xs = jnp.concatenate(
        [zr.reshape(zr.shape[:-1] + (rows, b)),
         zi.reshape(zi.shape[:-1] + (rows, b))], axis=-2)  # [..., 2r, b]
    # stage 1 over n1 (block-complex): [..., b, 2a] = (s1r | s1i)
    s1 = jnp.einsum("...nm,nk->...mk", xs, ablk,
                    preferred_element_type=jnp.float32,
                    precision=_PRECISION)
    s1r, s1i = s1[..., :a], s1[..., a:]
    t_r = s1r * twr - s1i * twi
    t_i = s1r * twi + s1i * twr
    tb = jnp.concatenate([t_r, t_i], axis=-2)              # [..., 2b, a]
    cols = k2_cols if k2_cols else b
    if cols < b:  # trim dead stage-2 columns (truncated output)
        bblk = jnp.concatenate([bblk[:, :cols], bblk[:, b:b + cols]],
                               axis=1)
    # stage 2 over n2 (block-complex): [..., a, 2cols] = (Zr | Zi) over k2
    s2 = jnp.einsum("...mk,ml->...kl", tb, bblk,
                    preferred_element_type=jnp.float32,
                    precision=_PRECISION)
    # output index k = k1 + a*k2 -> [k2, k1]-major reshape
    shp = zr.shape[:-1] + (a * cols,)
    z2r = jnp.swapaxes(s2[..., :cols], -1, -2).reshape(shp)
    z2i = jnp.swapaxes(s2[..., cols:], -1, -2).reshape(shp)
    return z2r, z2i


@functools.cache
def _half_twiddles_np(n: int, inverse: bool):
    """W^{-+k} for the even/odd untangle, k = 0..n/2."""
    k = np.arange(n // 2 + 1)
    s = 2j * np.pi if inverse else -2j * np.pi
    w = np.exp(s * k / n)
    return (np.ascontiguousarray(w.real.astype(np.float32)),
            np.ascontiguousarray(w.imag.astype(np.float32)))


def rfft_mxu(x: jnp.ndarray, n: int):
    """Real FFT of x [..., m] zero-padded/truncated to n; returns
    (re, im) of bins [..., n//2 + 1]."""
    m = x.shape[-1]
    if m > n:
        x = x[..., :n]
        m = n
    if n % 2 or n < 4:
        if m < n:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - m)])
        re, im = _fft_full_real_input(x, n)
        return re[..., : n // 2 + 1], im[..., : n // 2 + 1]
    h = n // 2
    # NOTE: trimming the zero stage-1 rows (n1_rows < a) for half-zero
    # frames saves input traffic on paper but was measured SLOWER on the
    # v5e (headline 576x -> 344x): the sub-128 contraction/lane dims force
    # relayouts that cost more than the skipped zeros. Full pad kept.
    if m < n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - m)])
    packed = x.reshape(x.shape[:-1] + (h, 2))
    zr, zi = _cfft(packed[..., 0], packed[..., 1], h, inverse=False)
    # untangle: E = (Z[k] + conj(Z[m-k]))/2, O = (Z[k] - conj(Z[m-k]))/2i,
    # X[k] = E[k] + W^k O[k] for k = 0..h (Z indices mod h)
    zer = jnp.concatenate([zr, zr[..., :1]], axis=-1)           # k = 0..h
    zei = jnp.concatenate([zi, zi[..., :1]], axis=-1)
    zvr = jnp.concatenate(
        [zr[..., :1], jnp.flip(zr[..., 1:], -1), zr[..., :1]], axis=-1)
    zvi = jnp.concatenate(
        [zi[..., :1], jnp.flip(zi[..., 1:], -1), zi[..., :1]], axis=-1)
    e_r = 0.5 * (zer + zvr)
    e_i = 0.5 * (zei - zvi)
    o_r = 0.5 * (zei + zvi)        # (N_r + i N_i)/2i = (N_i - i N_r)/2
    o_i = -0.5 * (zer - zvr)
    wr, wi = (jnp.asarray(w) for w in _half_twiddles_np(n, inverse=False))
    x_r = e_r + wr * o_r - wi * o_i
    x_i = e_i + wr * o_i + wi * o_r
    return x_r, x_i


def irfft_mxu(re: jnp.ndarray, im: jnp.ndarray, n: int,
              out_len: int = 0) -> jnp.ndarray:
    """Inverse real FFT from hermitian half-spectrum (re, im)
    [..., n//2+1] -> real [..., n] (or [..., >= out_len] if out_len > 0:
    only samples below out_len are valid - callers that immediately
    truncate, like the overlap-add synthesis keeping window_size of
    dft_size, skip computing the dead stage-2 outputs entirely).

    Mirror of rfft_mxu's packing: rebuild the half-length complex spectrum
    Z[k] = E[k] + i O[k] with E = (S[k]+conj(S[h-k]))/2 and
    O = W^{-k} (S[k]-conj(S[h-k]))/2, inverse complex FFT of length h,
    then deinterleave x[2j] = Re z[j], x[2j+1] = Im z[j].
    """
    if n % 2 or n < 4:
        y = _irfft_mirror(re, im, n)
        return y[..., :out_len] if out_len else y
    h = n // 2
    st_r, st_i = re[..., :h], im[..., :h]
    sv_r = jnp.flip(re[..., 1:], -1)          # S[h-k], k = 0..h-1
    sv_i = jnp.flip(im[..., 1:], -1)
    e_r = 0.5 * (st_r + sv_r)
    e_i = 0.5 * (st_i - sv_i)
    d_r = 0.5 * (st_r - sv_r)
    d_i = 0.5 * (st_i + sv_i)
    wr, wi = (jnp.asarray(w) for w in _half_twiddles_np(n, inverse=True))
    o_r = d_r * wr[:h] - d_i * wi[:h]
    o_i = d_r * wi[:h] + d_i * wr[:h]
    z_r = e_r - o_i                            # Z = E + i O
    z_i = e_i + o_r
    # NOTE: out_len could trim dead stage-2 columns (k2_cols < b), but the
    # sub-128 output lane dims were measured SLOWER on the v5e than
    # computing the full transform (see rfft_mxu note); out_len is kept in
    # the API as a documented no-op so callers state their intent.
    xr, xi = _cfft(z_r, z_i, h, inverse=True)
    out = jnp.stack([xr, xi], axis=-1)
    return out.reshape(re.shape[:-1] + (out.shape[-2] * 2,))


# ---------------------------------------------------------------------------
# Fallback full-length real-input DFT (odd/tiny n only). Same two-stage
# Cooley-Tukey factorization without the even/odd packing.


@functools.cache
def _matrices_np(n: int):
    a, b = _split(n)
    dft_a = np.exp(-2j * np.pi * np.outer(np.arange(a), np.arange(a)) / a)
    dft_b = np.exp(-2j * np.pi * np.outer(np.arange(b), np.arange(b)) / b)
    tw = np.exp(-2j * np.pi * np.outer(np.arange(b), np.arange(a)) / n)
    f32 = lambda x: np.ascontiguousarray(x.astype(np.float32))
    return (f32(dft_a.real), f32(dft_a.imag), f32(dft_b.real),
            f32(dft_b.imag), f32(tw.real), f32(tw.imag))


def _fft_full_real_input(x: jnp.ndarray, n: int):
    """Full complex DFT of real x [..., n] -> (re, im) each [..., n]."""
    a, b = _split(n)
    ar, ai, br, bi, twr, twi = (jnp.asarray(m) for m in _matrices_np(n))
    xs = x.reshape(x.shape[:-1] + (a, b))
    s1r = jnp.einsum("...nm,nk->...mk", xs, ar,
                     preferred_element_type=jnp.float32,
                     precision=_PRECISION)
    s1i = jnp.einsum("...nm,nk->...mk", xs, ai,
                     preferred_element_type=jnp.float32,
                     precision=_PRECISION)
    t_r = s1r * twr - s1i * twi
    t_i = s1r * twi + s1i * twr
    tb = jnp.concatenate([t_r, t_i], axis=-2)
    bblk = jnp.asarray(_block(np.asarray(_matrices_np(n)[2]),
                              np.asarray(_matrices_np(n)[3])))
    s2 = jnp.einsum("...mk,ml->...kl", tb, bblk,
                    preferred_element_type=jnp.float32,
                    precision=_PRECISION)
    shp = x.shape[:-1] + (n,)
    xr = jnp.swapaxes(s2[..., :b], -1, -2).reshape(shp)
    xi = jnp.swapaxes(s2[..., b:], -1, -2).reshape(shp)
    return xr, xi


def _irfft_mirror(re: jnp.ndarray, im: jnp.ndarray, n: int) -> jnp.ndarray:
    """Hermitian-mirror irfft via two full real-input DFTs (fallback)."""
    hi = n // 2 + 1 if n % 2 else n // 2  # odd n has no Nyquist bin
    mid_r = re[..., 1:hi]
    mid_i = im[..., 1:hi]
    full_r = jnp.concatenate([re, mid_r[..., ::-1]], axis=-1)
    full_i = jnp.concatenate([im, -mid_i[..., ::-1]], axis=-1)
    cr, _ = _fft_full_real_input(full_r, n)
    _, di = _fft_full_real_input(full_i, n)
    return (cr + di) / n
