"""Pallas lane-parallel linear recurrence - a measured-negative experiment.

STATUS: NOT wired into the filter paths. Amortized inside one jit on the
v5e (20 chained calls, subtracting the ~58 ms tunnel sync floor), for
[2, 2.88M] float32:

    tiled associative scan (ops/scan.py)   0.47 ms
    this Pallas two-pass kernel            1.55 ms

The Pallas form pays two custom-call launches plus real [P, seg] <->
[seg, P] relayouts; XLA's shift-combine scan is already within ~3x of
the HBM roofline here, so there is nothing left to win single-chip. The
round-1 observation that motivated this ("the scan chain is ~0.5 s per
stage") turned out to be a measurement artifact: wrapping jax.jit(lambda
...) INSIDE a timed closure retraces and relowers through the remote
compile server on every repetition (~1.2 s), and any standalone
device->host timing through the tunnel has a ~58 ms sync floor
(CLAUDE.md measurement rules).

Kept as the repo's Pallas reference implementation (grid carry-scratch
pattern, full-tile (8, 128) state layout, custom-VJP adjoint-as-reversed-
recurrence) for future kernels where XLA genuinely underperforms -
e.g. inter-chip RDMA pipelines. Validated bit-for-bit against the tiled
scan in tests/test_pallas_scan.py (interpret mode on CPU, real Mosaic
path on TPU).

    y[n] = a[n] * y[n-1] + b[n]

Structure: pass 1 composes per-chain affine maps sequentially; a tiny
[C, P] exclusive fold recovers each chain's true initial state; pass 2
re-runs the recurrence writing y. Chains fill both sublanes and lanes
((8, L) state tiles); time advances along the leading VMEM axis; the
recurrence state lives in scratch across grid steps; rows are unrolled
statically (dynamic leading indices make Mosaic materialize shifted
copies).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_SUB = 8            # sublanes per tile
_L = 1024           # lane-axis chains; P = _SUB * _L chains per channel
# seg rows per grid step: [C, _CHUNK, 8, _L] f32 = 1 MB at C=2. The
# a/b/y blocks are double-buffered by the pipeline, so _CHUNK=128's 4 MB
# blocks exceeded the 16 MB scoped-vmem limit (compile-time OOM).
_CHUNK = 32
# below this length per channel the padding waste and fixed costs exceed
# the win; callers should use the tiled scan instead
MIN_LEN = _SUB * _L * 8


from flan_tpu.ops.stft import _cdiv


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


@functools.partial(jax.jit, static_argnames=("interpret",))
def _compose_maps(a4, b4, *, interpret: bool):
    """a4, b4: [C, seg, 8, L] -> per-chain total maps (A, B) [C, 8, L]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c, seg, sub, lanes = a4.shape
    nk = _cdiv(seg, _CHUNK)

    def kernel(a_ref, b_ref, aout_ref, bout_ref, a_s, b_s):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            a_s[:] = jnp.ones_like(a_s)
            b_s[:] = jnp.zeros_like(b_s)

        # static row indices: a dynamic leading index makes Mosaic
        # materialize shifted copies per step; unrolled rows are plain
        # register-resident full-tile VPU work
        for i in range(a_ref.shape[1]):
            ai = a_ref[:, i]
            a_s[:] = ai * a_s[:]
            b_s[:] = ai * b_s[:] + b_ref[:, i]

        @pl.when(k == nk - 1)
        def _():
            aout_ref[:] = a_s[:]
            bout_ref[:] = b_s[:]

    return pl.pallas_call(
        kernel,
        grid=(nk,),
        in_specs=[
            pl.BlockSpec((c, _CHUNK, sub, lanes), lambda k: (0, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, _CHUNK, sub, lanes), lambda k: (0, k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((c, sub, lanes), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, sub, lanes), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((c, sub, lanes), jnp.float32),
                   jax.ShapeDtypeStruct((c, sub, lanes), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((c, sub, lanes), jnp.float32),
                        pltpu.VMEM((c, sub, lanes), jnp.float32)],
        interpret=interpret,
    )(a4, b4)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _apply_from(a4, b4, y_start, *, interpret: bool):
    """Run the recurrence per chain from initial states y_start [C, 8, L]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c, seg, sub, lanes = a4.shape
    nk = _cdiv(seg, _CHUNK)

    def kernel(y0_ref, a_ref, b_ref, y_ref, s_s):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            s_s[:] = y0_ref[:]

        for i in range(a_ref.shape[1]):  # static rows (see _compose_maps)
            s_s[:] = a_ref[:, i] * s_s[:] + b_ref[:, i]
            y_ref[:, i] = s_s[:]

    return pl.pallas_call(
        kernel,
        grid=(nk,),
        in_specs=[
            pl.BlockSpec((c, sub, lanes), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, _CHUNK, sub, lanes), lambda k: (0, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, _CHUNK, sub, lanes), lambda k: (0, k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, _CHUNK, sub, lanes),
                               lambda k: (0, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, seg, sub, lanes), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, sub, lanes), jnp.float32)],
        interpret=interpret,
    )(y_start, a4, b4)


def _forward(a: jnp.ndarray, b: jnp.ndarray, y0: jnp.ndarray):
    c, n = b.shape
    p = _SUB * _L                      # chains per channel
    seg = _cdiv(n, p)
    seg_pad = _cdiv(seg, _CHUNK) * _CHUNK
    npad = seg_pad * p
    # chain q of a channel owns samples [q*seg_pad, (q+1)*seg_pad);
    # time must advance along the VMEM-leading axis, so lay out
    # [C, chains, seg] -> [C, seg, chains] -> [C, seg, 8, L]
    ap = jnp.pad(a, [(0, 0), (0, npad - n)], constant_values=1.0)
    bp = jnp.pad(b, [(0, 0), (0, npad - n)])
    a4 = ap.reshape(c, p, seg_pad).swapaxes(-1, -2).reshape(
        c, seg_pad, _SUB, _L)
    b4 = bp.reshape(c, p, seg_pad).swapaxes(-1, -2).reshape(
        c, seg_pad, _SUB, _L)

    interp = _interpret()
    tot_a, tot_b = _compose_maps(a4, b4, interpret=interp)
    tot_a = tot_a.reshape(c, p)
    tot_b = tot_b.reshape(c, p)

    # exclusive affine fold across chains (log-depth, [C, P] - tiny)
    def combine(l, r):
        return l[0] * r[0], l[1] * r[0] + r[1]

    from flan_tpu.ops.scan import _hillis_steele_scan
    sa, sb = _hillis_steele_scan(combine, (1.0, 0.0), (tot_a, tot_b),
                                 axis=-1)
    ea = jnp.concatenate([jnp.ones_like(sa[:, :1]), sa[:, :-1]], axis=-1)
    eb = jnp.concatenate([jnp.zeros_like(sb[:, :1]), sb[:, :-1]], axis=-1)
    y_start = (ea * y0[:, None] + eb).reshape(c, _SUB, _L)

    y4 = _apply_from(a4, b4, y_start, interpret=interp)
    y = y4.reshape(c, seg_pad, p).swapaxes(-1, -2).reshape(c, npad)[:, :n]
    return y


@jax.custom_vjp
def linear_recurrence_pallas(a: jnp.ndarray, b: jnp.ndarray,
                             y0: jnp.ndarray) -> jnp.ndarray:
    """y[n] = a[n] y[n-1] + b[n], y[-1] = y0. a, b: [C, N]; y0: [C]."""
    return _forward(a, b, y0)


def _fwd(a, b, y0):
    y = _forward(a, b, y0)
    return y, (a, y, y0)


def _bwd(res, gy):
    a, y, y0 = res
    # adjoint: g[n] = a[n+1] g[n+1] + gy[n]  (reverse recurrence)
    a_next = jnp.concatenate([a[:, 1:], jnp.zeros_like(a[:, :1])], axis=-1)
    g = _forward(a_next[:, ::-1], gy[:, ::-1],
                 jnp.zeros_like(y0))[:, ::-1]
    y_prev = jnp.concatenate([y0[:, None], y[:, :-1]], axis=-1)
    da = g * y_prev
    db = g
    dy0 = g[:, 0] * a[:, 0]
    return da, db, dy0


linear_recurrence_pallas.defvjp(_fwd, _bwd)
