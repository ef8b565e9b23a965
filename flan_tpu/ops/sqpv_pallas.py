"""Fused Pallas TPU kernels for the SQPV sliding constant-Q transform.

Why this exists: the lax.scan forward in flan_tpu/sqpv/transform.py
materializes the three twiddle-line planes v/s/F ([3, C, L, B] re+im
pairs — 6x the size of the staged comb operand) in HBM between XLA
fusions, the same intermediate-plane round-tripping that capped the SPV
scan (ops/spv_pallas.py docstring). Here each 128-frame tile runs as
ONE Mosaic program: the staged comb operand feeds the three
local-twiddle lines, a lower-triangular MXU prefix per line, the
per-tile carry rotation, the spectral hann combine over the lines,
polar extraction and the phase-vocoder frequency estimate — only the
staged u and the final mag/freq planes touch HBM.

The comb staging itself (B static shifted slices of the padded signal,
plus the toward-zero trunc quirk now folded in as a host-precomputed
scatter) stays in XLA: it is plain memcpy traffic that Mosaic cannot
beat, and per-bin delays reach ~100k samples at 16 Hz so no VMEM ring
can carry them (unlike SPV's uniform 2B delay).

Semantics match transform.py's scan path (reference:
src/flan/Conversions/AudioSQPV.cpp:1-170) except arctan2, supplied by
the same degree-15 minimax polynomial as ops/spv_pallas.py. Carry
rotation differs only in association order (per-128 tile instead of
per-1024 chunk; |a| == 1), so mag matches to ~f32 ulp and freq to
sub-0.1 Hz on live bins — asserted in tests/test_sqpv_pallas.py.

Bins are padded to a multiple of 128 with period-1 dummy lines and
zero comb input (their output is sliced off); any bins_per_octave /
bandwidth therefore takes the fused path.
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flan_tpu.ops.fastmath import sincos_2pi as _sincos_2pi
from flan_tpu.ops.spv_pallas import _atan2, _interpret, _roll_rows

_F = 128   # frames per tile: one MXU-tile of prefix accumulation

# Prefix-accumulation strategy inside the Mosaic kernels (A/B'd on the
# real chip, tools/ab_sqpv_kernel.py, 10 s mono, docs/PERF_NOTES_R4.md):
#   "matmul"  - lower-triangular jnp.dot at `precision` (HIGHEST = 6
#               MXU passes; the round-3 baseline)
#   "split3"  - 3-way bf16 mantissa split of the data operand against an
#               EXACT bf16 0/1 triangle: 3 DEFAULT passes reproduce ~f32
#               mag accuracy at half the HIGHEST pass count (fwd 69.5 vs
#               81.9 ms) but trebles the live-bin pitch error (0.43 vs
#               0.15 Hz) - not adopted for the forward
#   "cumsum"  - log2(F) masked pltpu.roll shift-adds on the VPU; no MXU,
#               exact f32 pairwise adds. Fastest INVERSE (32.3 vs
#               38.1 ms) and adopted there; forward middle (73.1 ms)
# Per-kernel defaults below; setting _PREFIX_MODE (the A/B override)
# forces BOTH kernels to one mode.
_PREFIX_MODE = None
_PREFIX_MODE_FWD = "matmul"
_PREFIX_MODE_INV = "cumsum"
_PREFIX_MODES = ("matmul", "split3", "cumsum")


def _resolve_prefix_mode(default: str) -> str:
    """Per-kernel default unless _PREFIX_MODE is explicitly set (None is
    the only 'unset' value — an empty string from a sweep script is an
    error, not a fallthrough), validated against the known modes."""
    mode = _PREFIX_MODE if _PREFIX_MODE is not None else default
    if mode not in _PREFIX_MODES:
        raise ValueError(
            f"unknown SQPV prefix mode {mode!r}; expected one of "
            f"{_PREFIX_MODES}")
    return mode


def _prefix_f(v, tri, precision, mode):
    """Inclusive prefix sum of v [F, Bp] along axis 0 (rows)."""
    if mode not in _PREFIX_MODES:
        raise ValueError(f"unknown SQPV prefix mode {mode!r}")
    if mode == "matmul":
        return jnp.dot(tri, v, preferred_element_type=jnp.float32,
                       precision=precision)
    if mode == "split3":
        tri16 = tri.astype(jnp.bfloat16)      # 0/1: exact in bf16
        hi = v.astype(jnp.bfloat16)
        rem = v - hi.astype(jnp.float32)
        mid = rem.astype(jnp.bfloat16)
        lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jnp.dot(tri16, hi, preferred_element_type=jnp.float32)
        acc += jnp.dot(tri16, mid, preferred_element_type=jnp.float32)
        acc += jnp.dot(tri16, lo, preferred_element_type=jnp.float32)
        return acc
    # cumsum: log-shift adds; roll wraps, mask off the wrapped rows
    f = v.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    sh = 1
    while sh < f:
        rolled = pltpu.roll(v, shift=sh, axis=0)
        v = v + jnp.where(rows >= sh, rolled, jnp.float32(0.0))
        sh *= 2
    return v


def _cq_tables(sample_rate: float, bins_per_octave: float,
               bandwidth: Tuple[float, float], bpad: int):
    """Host float64 twiddle tables for the fused forward, padded to bpad
    bins: t1 = a^{-i}, t2 = a^{i+1} over the tile-local index i in
    [0, 128), per twiddle line j in {-1, 0, +1} (transform.py:83-91)."""
    from flan_tpu.sqpv.transform import _cq_params
    q, nbins, freqs, periods = _cq_params(sample_rate, bins_per_octave,
                                          bandwidth)
    pp = np.ones((bpad,), np.float64)
    pp[:nbins] = periods
    jv = np.array([-1.0, 0.0, 1.0])
    theta = 2.0 * np.pi * (q + jv[:, None]) / pp[None, :]   # [3, Bp]
    i_loc = np.arange(_F, dtype=np.float64)
    t1 = np.exp(-1j * i_loc[None, :, None] * theta[:, None, :])
    t2 = np.exp(1j * (i_loc + 1.0)[None, :, None] * theta[:, None, :])
    fpad = np.zeros((bpad,), np.float64)
    fpad[:nbins] = freqs
    return (q, nbins, fpad, periods,
            t1.real.astype(np.float32), t1.imag.astype(np.float32),
            t2.real.astype(np.float32), t2.imag.astype(np.float32))


_TPB = 8   # frame-tiles per Mosaic program: 4152 single-tile grid steps
           # measured 84 ms (~20 us/step overhead-bound); batching tiles
           # amortizes the per-step cost while the carry chains in VMEM.
           # Round-4 sweep (tools/ab_sqpv_kernel.py): tpb 8 fwd 73.3 ms
           # vs tpb 4's 81.9 (469 fewer steps x ~18 us); tpb 16's
           # compile blew the 600 s probe budget. Set BEFORE first use;
           # read at trace time by staging, kernels and specs alike.


def _fwd_kernel(u_re_ref, u_im_ref, t1re_ref, t1im_ref, t2re_ref,
                t2im_ref, binf_ref, qk_ref, x0_ref, mag_ref, freq_ref,
                carry, *, sample_rate: float, precision,
                prefix_mode: str = "matmul"):
    """carry rows: 0-2 F_re lines, 3-5 F_im lines, 6 prev phase.
    qk rows: 0 i_new, 1 i_old, 2 co_new_re, 3 co_new_im, 4 co_old_re
    (the toward-zero trunc quirk, applied here as per-tile mask math so
    the staging stays a bare slice->stack chain — see _stage_comb)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    bp = u_re_ref.shape[2]
    x0 = x0_ref[0, 0]
    ri = jax.lax.broadcasted_iota(jnp.int32, (_F, _F), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (_F, _F), 1)
    tri = jnp.where(ri >= ci, jnp.float32(1.0), jnp.float32(0.0))
    binf = binf_ref[0:1, :]                             # [1, Bp]
    two_pi = jnp.float32(2.0 * np.pi)
    expected = binf * jnp.float32(2.0 * np.pi / sample_rate)

    for k in range(_TPB):
        rows = slice(k * _F, (k + 1) * _F)
        u_re = u_re_ref[0, rows]                        # [F, Bp]
        u_im = u_im_ref[0, rows]
        gi = ((t * _TPB + k) * _F
              + jax.lax.broadcasted_iota(jnp.int32, (_F, bp), 0)
              ).astype(jnp.float32)
        m_new = (gi == qk_ref[0:1, :]).astype(jnp.float32)
        m_old = (gi == qk_ref[1:2, :]).astype(jnp.float32)
        u_re = u_re + x0 * (qk_ref[2:3, :] * m_new
                            + qk_ref[4:5, :] * m_old)
        u_im = u_im + x0 * (qk_ref[3:4, :] * m_new)

        fw_re = None
        fw_im = None
        lasts = []
        for l in range(3):
            t1_re = t1re_ref[l]                         # [F, Bp]
            t1_im = t1im_ref[l]
            v_re = u_re * t1_re - u_im * t1_im
            v_im = u_re * t1_im + u_im * t1_re
            s_re = _prefix_f(v_re, tri, precision,
                             prefix_mode) + carry[l:l + 1, :]
            s_im = _prefix_f(v_im, tri, precision,
                             prefix_mode) + carry[l + 3:l + 4, :]
            t2_re = t2re_ref[l]
            t2_im = t2im_ref[l]
            F_re = s_re * t2_re - s_im * t2_im
            F_im = s_re * t2_im + s_im * t2_re
            # spectral hann over the twiddle lines (AudioSQPV.cpp:110-112)
            wgt = jnp.float32(0.5 if l == 1 else -0.25)
            fw_re = F_re * wgt if fw_re is None else fw_re + F_re * wgt
            fw_im = F_im * wgt if fw_im is None else fw_im + F_im * wgt
            lasts.append((F_re[_F - 1:_F, :], F_im[_F - 1:_F, :]))

        energy = fw_re * fw_re + fw_im * fw_im
        dead = energy == 0.0
        mag = jnp.where(dead, 0.0,
                        jnp.sqrt(jnp.where(dead, 1.0, energy)))
        phase = _atan2(jnp.where(dead, 0.0, fw_im),
                       jnp.where(dead, 1.0, fw_re))

        prev = _roll_rows(phase, carry[6:7, :])
        d = phase - prev - expected
        d = d - two_pi * jnp.round(d / two_pi)
        freq = binf + d * jnp.float32(sample_rate / (2.0 * np.pi))

        mag_ref[0, rows] = mag
        freq_ref[0, rows] = freq
        for l in range(3):
            carry[l:l + 1, :] = lasts[l][0]
            carry[l + 3:l + 4, :] = lasts[l][1]
        carry[6:7, :] = phase[_F - 1:_F, :]


@functools.partial(jax.jit, static_argnames=(
    "sample_rate", "bins_per_octave", "bandwidth"))
def _stage_fused(x, *, sample_rate: float, bins_per_octave: float,
                 bandwidth: Tuple[float, float]):
    """Stage the comb operand as [Bp, C, T] (time minor - natural concat
    layouts). Runs as its OWN jit: inside one program with the kernel,
    XLA's layout assignment for the pallas operand propagates a
    bins-minor layout back through the concat and materializes every
    slice as a 128x-padded temp (65 GB at the 10 s bench). At the jit
    boundary the output takes the default row-major layout, and the
    consumer program pays one fast [Bp, C, T] -> [C, T, Bp] relayout."""
    from flan_tpu.sqpv.transform import _cq_params, _stage_comb
    _, nb0, _, _ = _cq_params(sample_rate, bins_per_octave, bandwidth)
    u_re, u_im, w0, nbins, bpad = _stage_comb(
        x, sample_rate, bins_per_octave, bandwidth, tile=_F * _TPB,
        bpad=-(-nb0 // _F) * _F, quirk=False, stack_axis=0)
    return u_re, u_im


def sqpv_forward_fused(x, *, sample_rate: float, bins_per_octave: float,
                       bandwidth: Tuple[float, float],
                       precision=jax.lax.Precision.HIGHEST):
    """Audio [C, N] -> (mag, pitch, positive) each [C, N, B], fused.
    Two device programs (staging | transpose + Mosaic kernel) - the
    split is deliberate, see _stage_fused."""
    u_re_t, u_im_t = _stage_fused(
        x, sample_rate=float(sample_rate),
        bins_per_octave=float(bins_per_octave),
        bandwidth=(float(bandwidth[0]), float(bandwidth[1])))
    return _forward_fused_core(
        x, u_re_t, u_im_t, sample_rate=float(sample_rate),
        bins_per_octave=float(bins_per_octave),
        bandwidth=(float(bandwidth[0]), float(bandwidth[1])),
        precision=precision,
        prefix_mode=_resolve_prefix_mode(_PREFIX_MODE_FWD))


@functools.partial(jax.jit, static_argnames=(
    "sample_rate", "bins_per_octave", "bandwidth", "precision",
    "prefix_mode"))
def _forward_fused_core(x, u_re_t, u_im_t, *, sample_rate: float,
                        bins_per_octave: float,
                        bandwidth: Tuple[float, float],
                        precision=jax.lax.Precision.HIGHEST,
                        prefix_mode: str = "matmul"):
    from flan_tpu.sqpv.transform import _cq_params
    c, n = x.shape
    q0, nbins, freqs0, periods0 = _cq_params(sample_rate, bins_per_octave,
                                             bandwidth)
    bpad = u_re_t.shape[0]
    w0 = int(periods0.max() // 2 + 2)
    u_re = u_re_t.transpose(1, 2, 0)                      # [C, T, Bp]
    u_im = u_im_t.transpose(1, 2, 0)
    nblocks = u_re.shape[1] // (_F * _TPB)
    (q, _, freqs_pad, periods, t1_re, t1_im, t2_re, t2_im) = _cq_tables(
        sample_rate, bins_per_octave, bandwidth, bpad)

    # toward-zero trunc quirk table (see _fwd_kernel docstring): one
    # x[0] read per odd-period bin/side, at staged-timeline positions
    # w0 -+ the half-period offsets (reference AudioSQPV.cpp:100-103)
    fiddle = np.exp(-1j * 2.0 * np.pi * q)
    off_p = (periods // 2).astype(np.int64)
    off_m = ((periods + 1) // 2).astype(np.int64)
    odd = periods % 2 == 1
    inv_n = 1.0 / periods.astype(np.float64)
    qk = np.full((5, bpad), -1.0, np.float32)
    qk[2:, :] = 0.0
    qk[0, :nbins] = np.where(odd, (w0 - off_m).astype(np.float64), -1.0)
    qk[1, :nbins] = np.where(odd, (w0 + off_p).astype(np.float64), -1.0)
    qk[2, :nbins] = np.where(odd, fiddle.real * inv_n, 0.0)
    qk[3, :nbins] = np.where(odd, fiddle.imag * inv_n, 0.0)
    qk[4, :nbins] = np.where(odd, -inv_n, 0.0)
    x0 = x[:, 0:1]                                        # [C, 1]

    kern = functools.partial(_fwd_kernel, sample_rate=float(sample_rate),
                             precision=precision, prefix_mode=prefix_mode)
    tab = lambda ch, t: (0, 0, 0)
    tspec = pl.BlockSpec((3, _F, bpad), tab, memory_space=pltpu.VMEM)
    blk = _TPB * _F
    mag, freq = pl.pallas_call(
        kern,
        grid=(c, nblocks),
        in_specs=[
            pl.BlockSpec((1, blk, bpad), lambda ch, t: (ch, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, bpad), lambda ch, t: (ch, t, 0),
                         memory_space=pltpu.VMEM),
            tspec, tspec, tspec, tspec,
            pl.BlockSpec((1, bpad), lambda ch, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, bpad), lambda ch, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda ch, t: (ch, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, bpad), lambda ch, t: (ch, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, bpad), lambda ch, t: (ch, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, nblocks * blk, bpad), jnp.float32),
            jax.ShapeDtypeStruct((c, nblocks * blk, bpad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((8, bpad), jnp.float32)],
        interpret=_interpret(),
    )(u_re, u_im, jnp.asarray(t1_re), jnp.asarray(t1_im),
      jnp.asarray(t2_re), jnp.asarray(t2_im),
      jnp.asarray(freqs_pad.astype(np.float32))[None, :],
      jnp.asarray(qk), x0)

    mag = mag[:, w0:w0 + n, :nbins]
    freq = freq[:, w0:w0 + n, :nbins]
    pitch = jnp.log2(jnp.maximum(jnp.abs(freq), 1e-12))
    positive = freq >= 0
    return mag, pitch, positive


def _inv_kernel(mag_ref, freq_ref, twre_ref, twim_ref, out_ref, cyc,
                *, sample_rate: float, precision,
                prefix_mode: str = "matmul"):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        cyc[:] = jnp.zeros_like(cyc)

    ri = jax.lax.broadcasted_iota(jnp.int32, (_F, _F), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (_F, _F), 1)
    tri = jnp.where(ri >= ci, jnp.float32(1.0), jnp.float32(0.0))
    for k in range(_TPB):
        rows = slice(k * _F, (k + 1) * _F)
        m = mag_ref[0, rows]                             # [F, Bp]
        fr = freq_ref[0, rows]
        inc = fr * jnp.float32(1.0 / sample_rate)
        inc = inc - jnp.floor(inc)
        run = _prefix_f(inc, tri, precision, prefix_mode) + cyc[0:1, :]
        cycles = run - jnp.floor(run)
        # Re( polar(m, 2 pi cycles) * twiddle_k ), summed over bins; the
        # polynomial sincos (ops/fastmath.py) takes mod-1 cycles directly
        sn, cs = _sincos_2pi(cycles)
        real = m * (cs * twre_ref[0:1, :] - sn * twim_ref[0:1, :])
        out_ref[0, rows] = jnp.sum(real, axis=1, keepdims=True)
        cyc[:] = cycles[_F - 1:_F, :]


def sqpv_inverse_fused(mag, pitch, positive, *, sample_rate: float,
                       bins_per_octave: float,
                       bandwidth: Tuple[float, float],
                       precision=jax.lax.Precision.HIGHEST):
    """(mag, pitch, positive) [C, F, B] -> audio [C, F], fused form of
    transform.py _sqpv_inverse_scan (AudioSQPV.cpp:128-165)."""
    return _inverse_fused_core(
        mag, pitch, positive, sample_rate=float(sample_rate),
        bins_per_octave=float(bins_per_octave),
        bandwidth=(float(bandwidth[0]), float(bandwidth[1])),
        precision=precision,
        prefix_mode=_resolve_prefix_mode(_PREFIX_MODE_INV))


@functools.partial(jax.jit, static_argnames=(
    "sample_rate", "bins_per_octave", "bandwidth", "precision",
    "prefix_mode"))
def _inverse_fused_core(mag, pitch, positive, *, sample_rate: float,
                        bins_per_octave: float,
                        bandwidth: Tuple[float, float],
                        precision=jax.lax.Precision.HIGHEST,
                        prefix_mode: str = "matmul"):
    from flan_tpu.sqpv.transform import _cq_params
    c, f, b = mag.shape
    q, nbins, freqs, periods = _cq_params(sample_rate, bins_per_octave,
                                          bandwidth)
    assert b == nbins, (b, nbins)
    bpad = -(-b // _F) * _F
    tw = np.exp(1j * 2.0 * np.pi * q / periods.astype(np.float64))
    tw_re = np.zeros((bpad,), np.float32)
    tw_im = np.zeros((bpad,), np.float32)
    tw_re[:b] = tw.real
    tw_im[:b] = tw.imag

    blk = _TPB * _F
    nblocks = -(-f // blk)
    fpad = nblocks * blk
    sign = jnp.where(positive, 1.0, -1.0).astype(jnp.float32)
    freq = sign * jnp.exp2(pitch)
    pads = [(0, 0), (0, fpad - f), (0, bpad - b)]
    mag = jnp.pad(mag, pads)
    freq = jnp.pad(freq, pads)

    kern = functools.partial(_inv_kernel, sample_rate=float(sample_rate),
                             precision=precision, prefix_mode=prefix_mode)
    out = pl.pallas_call(
        kern,
        grid=(c, nblocks),
        in_specs=[
            pl.BlockSpec((1, blk, bpad), lambda ch, t: (ch, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, bpad), lambda ch, t: (ch, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bpad), lambda ch, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bpad), lambda ch, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, 1), lambda ch, t: (ch, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, fpad, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, bpad), jnp.float32)],
        interpret=_interpret(),
    )(mag, freq, jnp.asarray(tw_re)[None, :], jnp.asarray(tw_im)[None, :])
    return out[:, :f, 0]
