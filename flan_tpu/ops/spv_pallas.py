"""Fused Pallas TPU kernels for the SPV sliding-DFT forward/inverse.

Why this exists: the lax.scan forms in flan_tpu/spv/spv.py materialize
~10 intermediate [C, chunk, B] planes per chunk in HBM (contributions,
prefix sums, rotated frames, stencil taps, polar planes) — measured
111.6 ms forward / 98.3 ms inverse for 30 s mono at 512 bins, nearly
all of it HBM round trips between XLA fusions (tools/spv_split_timing).
Fused: 72.9 ms forward / 52.6 ms inverse on the same chip — roundtrip
174.9x -> 316.8x realtime at identical 30 dB SNR.
Here each 128-frame tile runs as ONE Mosaic program: the comb deltas
feed a lower-triangular MXU matmul prefix against the VMEM-resident
twiddle table, and rotation, the 3-tap hann bin stencil, polar
extraction and phase-vocoder frequency estimation all stay on chip.
Only the final mag/freq planes touch HBM.

Layout notes (Mosaic block rules force both):
- x streams in as [C, nsup, 8, 128] super-tiles of 8 frame-tiles (a
  (1, 8, 128) block; (1, 1, 128) blocks are rejected — the sublane dim
  must be a multiple of 8 or the whole axis).
- The comb's two_b-delayed operand is NOT a second offset view of x
  (two_b is not block-aligned for nbins < 512); instead a 16-row VMEM
  ring buffer carries the last 16 frame-tiles of the signal across grid
  steps, so the delayed tile is a one-row ring read and the zero
  lead-in falls out of the ring's t==0 reset.

Semantics match flan_tpu/spv/spv.py _spv_forward_scan exactly (same
reference citations: AudioSPV.cpp:13-92, phase_vocoder.cpp:37) except
arctan2, which Mosaic does not lower: a degree-15 odd minimax
polynomial supplies atan to ~7.5e-8 max error (≈1.1e-3 Hz of frequency
at 48 kHz — far below the representation's own 30 dB roundtrip floor).
Verified equivalent to the scan path in tests/test_spv_pallas.py: mag
to f32 ulp, freq to <0.1 Hz on every bin carrying >1e-3 of peak
magnitude (near-dead bins see larger phase noise by construction).

Constraints for the fused path (callers fall back to the scan form
otherwise): nbins a multiple of 128 and <= 1024 (twiddle table and ring
resident in VMEM).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F = 128   # frames per tile: one MXU-tile of prefix accumulation
_SUP = 8   # frame-tiles per x super-tile block
_RING = 16  # ring rows: supports comb delays up to 16 tiles (nbins 1024)

# shared with the XLA paths (ops/fastmath.py): the same polynomial that
# Mosaic needs (arctan2 does not lower) also beats XLA's TPU arctan2
from flan_tpu.ops.fastmath import atan2 as _atan2  # noqa: E402


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _roll_rows(x, carry_row):
    """Shift rows down by one; row 0 <- carry_row ([1, B])."""
    f = x.shape[0]
    rolled = jnp.concatenate([x[f - 1:f, :], x[:f - 1, :]], axis=0)
    ri = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(ri == 0, carry_row, rolled)


def _shift_bins(x, direction):
    """Neighbor-bin tap: direction=+1 gives x[..., b-1] (shift right),
    -1 gives x[..., b+1]; the vacated edge column is garbage and must be
    masked by the caller."""
    b = x.shape[1]
    if direction == +1:
        return jnp.concatenate([x[:, b - 1:], x[:, :b - 1]], axis=1)
    return jnp.concatenate([x[:, 1:], x[:, :1]], axis=1)


def _twiddle_table_padded(nbins: int):
    """[2B+1, B] twiddle: one full period plus a wrap row so the
    rotate-to-frame-phase slice (rows off+1 .. off+F) never leaves the
    table (the table is periodic: row 2B == row 0). Exact integer phase
    reduction mod 2B, as AudioSPV.cpp:13-38 indexes its table."""
    two_b = 2 * nbins
    j = np.arange(two_b + 1, dtype=np.int64)
    b = np.arange(nbins, dtype=np.int64)
    idx = (j[:, None] * b[None, :]) % two_b
    ang = -2.0 * np.pi / two_b * idx.astype(np.float64)
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def _fwd_kernel(x_ref, twre_ref, twim_ref, mag_ref, freq_ref,
                sre, sim, pph, ring, *, nbins: int, sample_rate: float,
                precision):
    t = pl.program_id(1)
    k = pl.program_id(2)
    tile = t * _SUP + k                       # global frame-tile index
    first = jnp.logical_and(t == 0, k == 0)

    @pl.when(first)
    def _():
        sre[:] = jnp.zeros_like(sre)
        sim[:] = jnp.zeros_like(sim)
        pph[:] = jnp.zeros_like(pph)
        ring[:] = jnp.zeros_like(ring)

    two_b = 2 * nbins
    m = two_b // _F                           # comb delay in tiles (<=16)

    cur = x_ref[0, 0, pl.ds(k, 1), :]         # [1, F]
    delayed = ring[pl.ds(jax.lax.rem(tile - m + _RING, _RING), 1), :]
    ring[pl.ds(jax.lax.rem(tile, _RING), 1), :] = cur
    delta = cur - delayed

    ri = jax.lax.broadcasted_iota(jnp.int32, (_F, _F), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (_F, _F), 1)
    trid = jnp.where(ri >= ci, jnp.float32(1.0), jnp.float32(0.0)) * delta

    off = pl.multiple_of(jax.lax.rem(tile, m) * _F, _F)
    w_re = twre_ref[pl.ds(off, _F), :]        # [F, B]
    w_im = twim_ref[pl.ds(off, _F), :]
    s_re = jnp.dot(trid, w_re, preferred_element_type=jnp.float32,
                   precision=precision) + sre[0:1, :]
    s_im = jnp.dot(trid, w_im, preferred_element_type=jnp.float32,
                   precision=precision) + sim[0:1, :]

    # rotate to the frame's reference phase: * conj(twiddle[row+1]).
    # Mosaic cannot load 128 rows from the unaligned offset off+1, so
    # the shifted tile is w rows 1.. plus the (aligned) row off+F.
    wrap_re = twre_ref[pl.ds(pl.multiple_of(off + _F, _F), 1), :]
    wrap_im = twim_ref[pl.ds(pl.multiple_of(off + _F, _F), 1), :]
    wn_re = jnp.concatenate([w_re[1:], wrap_re], axis=0)
    wn_im = jnp.concatenate([w_im[1:], wrap_im], axis=0)
    f_re = s_re * wn_re + s_im * wn_im
    f_im = s_im * wn_re - s_re * wn_im

    # 3-tap hann spectral convolution (AudioSPV.cpp:65-92). Edge semantics
    # golden-tested vs the compiled reference (tests/test_algo_golden.py):
    # at bin 0 BOTH neighbor taps collapse to 2*Re(f[1]) (bStart,
    # AudioSPV.cpp:71-74) and at bin B-1 to 2*Re(f[B-2]) (bEnd, :85-89) -
    # the natural complex neighbor is NOT also subtracted.
    col = jax.lax.broadcasted_iota(jnp.int32, (_F, nbins), 1)
    edge_l = 2.0 * f_re[:, 1:2]
    edge_r = 2.0 * f_re[:, nbins - 2:nbins - 1]
    inv = jnp.float32(0.25 / two_b)

    left_re = jnp.where(col == 0, edge_l,
                        jnp.where(col == nbins - 1, jnp.float32(0.0),
                                  _shift_bins(f_re, +1)))
    right_re = jnp.where(col == nbins - 1, edge_r,
                         jnp.where(col == 0, jnp.float32(0.0),
                                   _shift_bins(f_re, -1)))
    conv_re = (2.0 * f_re - left_re - right_re) * inv

    left_im = jnp.where((col == 0) | (col == nbins - 1), jnp.float32(0.0),
                        _shift_bins(f_im, +1))
    right_im = jnp.where((col == nbins - 1) | (col == 0), jnp.float32(0.0),
                         _shift_bins(f_im, -1))
    conv_im = (2.0 * f_im - left_im - right_im) * inv

    energy = conv_re * conv_re + conv_im * conv_im
    dead = energy == 0.0
    mag = jnp.where(dead, 0.0, jnp.sqrt(jnp.where(dead, 1.0, energy)))
    phase = _atan2(jnp.where(dead, 0.0, conv_im),
                   jnp.where(dead, 1.0, conv_re))

    prev = _roll_rows(phase, pph[0:1, :])
    # expected per-sample phase advance of bin b is pi*b/nbins; freq
    # recovery + wrap exactly as the scan path (phase_vocoder.cpp:37,
    # deliberate wrap documented in spv.py)
    binf = col.astype(jnp.float32) * jnp.float32(sample_rate / two_b)
    d = phase - prev - col.astype(jnp.float32) * jnp.float32(np.pi / nbins)
    two_pi = jnp.float32(2.0 * np.pi)
    d = d - two_pi * jnp.round(d / two_pi)
    freq = binf + d * jnp.float32(sample_rate / (2.0 * np.pi))

    mag_ref[0] = mag
    freq_ref[0] = freq
    sre[:] = s_re[_F - 1:_F, :]
    sim[:] = s_im[_F - 1:_F, :]
    pph[:] = phase[_F - 1:_F, :]


def fused_forward_supported(nbins: int) -> bool:
    return nbins % _F == 0 and nbins <= (_RING * _F) // 2


@functools.partial(jax.jit, static_argnames=("nbins", "sample_rate",
                                             "precision"))
def spv_forward_fused(x, *, nbins: int, sample_rate: float,
                      precision=jax.lax.Precision.HIGHEST):
    """Audio [C, N] -> (mag, freq) [C, N, nbins], fused-kernel form."""
    assert fused_forward_supported(nbins), nbins
    c, n = x.shape
    two_b = 2 * nbins
    nsup = -(-n // (_SUP * _F))
    npad = nsup * _SUP * _F
    xt = jnp.pad(x, [(0, 0), (0, npad - n)]).reshape(c, nsup, _SUP, _F)
    tw_re, tw_im = _twiddle_table_padded(nbins)

    kern = functools.partial(_fwd_kernel, nbins=nbins,
                             sample_rate=float(sample_rate),
                             precision=precision)
    mag, freq = pl.pallas_call(
        kern,
        grid=(c, nsup, _SUP),
        in_specs=[
            pl.BlockSpec((1, 1, _SUP, _F), lambda ch, t, k: (ch, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((two_b + 1, nbins), lambda ch, t, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((two_b + 1, nbins), lambda ch, t, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _F, nbins),
                         lambda ch, t, k: (ch, t * _SUP + k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _F, nbins),
                         lambda ch, t, k: (ch, t * _SUP + k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, npad, nbins), jnp.float32),
            jax.ShapeDtypeStruct((c, npad, nbins), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, nbins), jnp.float32),
            pltpu.VMEM((1, nbins), jnp.float32),
            pltpu.VMEM((1, nbins), jnp.float32),
            pltpu.VMEM((_RING, _F), jnp.float32),
        ],
        interpret=_interpret(),
    )(xt, jnp.asarray(tw_re), jnp.asarray(tw_im))
    return mag[:, :n], freq[:, :n]


def _inv_kernel(mag_ref, freq_ref, out_ref, cyc, *, nbins: int,
                sample_rate: float, precision):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        cyc[:] = jnp.zeros_like(cyc)

    m = mag_ref[0]                                       # [F, B]
    fr = freq_ref[0]
    inc = fr * jnp.float32(1.0 / sample_rate)
    inc = inc - jnp.floor(inc)
    ri = jax.lax.broadcasted_iota(jnp.int32, (_F, _F), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (_F, _F), 1)
    tri = jnp.where(ri >= ci, jnp.float32(1.0), jnp.float32(0.0))
    run = jnp.dot(tri, inc, preferred_element_type=jnp.float32,
                  precision=precision) + cyc[0:1, :]
    cycles = run - jnp.floor(run)
    col = jax.lax.broadcasted_iota(jnp.int32, (_F, nbins), 1)
    signs = jnp.where(jax.lax.rem(col, 2) == 0, jnp.float32(1.0),
                      jnp.float32(-1.0))
    real = m * jnp.cos(cycles * jnp.float32(2.0 * np.pi)) * signs
    out_ref[0] = 2.0 * jnp.sum(real, axis=1, keepdims=True)
    cyc[:] = cycles[_F - 1:_F, :]


@functools.partial(jax.jit, static_argnames=("sample_rate", "precision"))
def spv_inverse_fused(mag, freq, *, sample_rate: float,
                      precision=jax.lax.Precision.HIGHEST):
    """(mag, freq) [C, F, B] -> audio [C, F], fused-kernel form of
    spv.py _spv_inverse_scan (AudioSPV.cpp:113-145): per-bin mod-1 phase
    accumulation as a triangular MXU prefix chained through a VMEM
    carry, then the alternating-sign real-part reduction — one Mosaic
    program per 128-frame tile, no intermediate planes in HBM."""
    c, n, b = mag.shape
    ntiles = -(-n // _F)
    npad = ntiles * _F
    if npad != n:
        mag = jnp.pad(mag, [(0, 0), (0, npad - n), (0, 0)])
        freq = jnp.pad(freq, [(0, 0), (0, npad - n), (0, 0)])
    kern = functools.partial(_inv_kernel, nbins=b,
                             sample_rate=float(sample_rate),
                             precision=precision)
    out = pl.pallas_call(
        kern,
        grid=(c, ntiles),
        in_specs=[
            pl.BlockSpec((1, _F, b), lambda ch, t: (ch, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _F, b), lambda ch, t: (ch, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _F, 1), lambda ch, t: (ch, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, npad, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, b), jnp.float32)],
        interpret=_interpret(),
    )(mag, freq)
    return out[:, :n, 0]
