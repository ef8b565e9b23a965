"""Parallel recurrence solvers (associative scans).

The reference's per-sample IIR loops (filters AudioFilter.cpp:61-186,
compressor peak detector AudioVolume.cpp:246-253, resonate PV.cpp:602) are
strictly sequential on CPU. On TPU every one of them is an associative scan:

* first-order linear y[n] = a[n] y[n-1] + b[n]  -> affine-map composition
* the compressor's max-smoother y[n] = max(m[n], a[n] y[n-1] + c[n])
  -> the class {y -> max(m, a y + c)} is closed under composition
* k-dim state recurrences (2-pole SVF, allpass cascades) -> small-matrix
  affine composition

All run in O(log n) depth via jax.lax.associative_scan, vectorized over
channels/bins on the VPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_recurrence(a: jnp.ndarray, b: jnp.ndarray,
                      y0=0.0, axis: int = -1) -> jnp.ndarray:
    """Solve y[n] = a[n] * y[n-1] + b[n] with y[-1] = y0, in parallel.

    a, b broadcastable; scan along `axis`. Returns y with same shape as b.
    """
    a = jnp.broadcast_to(a, b.shape).astype(b.dtype)

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, bl * ar + br

    aa, bb = jax.lax.associative_scan(combine, (a, b), axis=axis)
    y0_arr = jnp.asarray(y0, b.dtype)
    return aa * y0_arr + bb


def max_affine_recurrence(m: jnp.ndarray, a: jnp.ndarray, c: jnp.ndarray,
                          y0=0.0, axis: int = -1) -> jnp.ndarray:
    """Solve y[n] = max(m[n], a[n] * y[n-1] + c[n]) in parallel.

    Composition law: (m2,a2,c2) o (m1,a1,c1) =
    (max(m2, a2*m1 + c2), a2*a1, a2*c1 + c2). Used by the compressor's
    smooth decoupled peak detector (reference AudioVolume.cpp:246-253).
    Requires a >= 0 (true for exp(-1/t*sr) smoothing coefficients).
    """
    shape = jnp.broadcast_shapes(m.shape, a.shape, c.shape)
    m = jnp.broadcast_to(m, shape)
    a = jnp.broadcast_to(a, shape).astype(m.dtype)
    c = jnp.broadcast_to(c, shape).astype(m.dtype)

    def combine(l, r):
        ml, al, cl = l
        mr, ar, cr = r
        return (jnp.maximum(mr, ar * ml + cr), al * ar, ar * cl + cr)

    mm, aa, cc = jax.lax.associative_scan(combine, (m, a, c), axis=axis)
    y0_arr = jnp.asarray(y0, m.dtype)
    return jnp.maximum(mm, aa * y0_arr + cc)


def matrix_affine_recurrence(A: jnp.ndarray, b: jnp.ndarray,
                             y0: jnp.ndarray) -> jnp.ndarray:
    """Solve y[n] = A[n] @ y[n-1] + b[n] for small state dims, in parallel.

    A: [..., T, k, k], b: [..., T, k], y0: [..., k]. Scans along the T
    axis; k is 2 for the reference's 2-pole SVF state (s1, s2).

    Internally the matrix dims are moved to the FRONT so the long T axis
    rides the vector lanes: scanning [..., T, 2, 2] directly leaves T on a
    sublane-tiled axis, which this TPU backend refuses at large T
    (UNIMPLEMENTED) - with [k, k, ..., T] every combine is a plain
    elementwise multiply-add over lane-major arrays, the same class as
    linear_recurrence.
    """
    k = A.shape[-1]
    # [k*k, ..., T] and [k, ..., T]: same ndim so associative_scan can use
    # one axis index; A[i, j] lives at flat index i*k + j
    At = jnp.transpose(A, (A.ndim - 2, A.ndim - 1)
                       + tuple(range(A.ndim - 2)))
    At = At.reshape((k * k,) + At.shape[2:])
    bt = jnp.transpose(b, (b.ndim - 1,) + tuple(range(b.ndim - 1)))

    def combine(l, r):
        Al, bl = l
        Ar, br = r
        # (Ar @ Al)[i, j] = sum_m Ar[i, m] * Al[m, j], elementwise over T
        AA = jnp.stack([
            sum(Ar[i * k + m] * Al[m * k + j] for m in range(k))
            for i in range(k) for j in range(k)], axis=0)
        bb = jnp.stack([
            sum(Ar[i * k + m] * bl[m] for m in range(k)) + br[i]
            for i in range(k)], axis=0)
        return AA, bb

    AA, bb = jax.lax.associative_scan(combine, (At, bt), axis=At.ndim - 1)
    # y[t] = AA[t] @ y0 + bb[t], components over leading dims
    y = jnp.stack([
        sum(AA[i * k + m] * y0[..., m, None] for m in range(k)) + bb[i]
        for i in range(k)], axis=0)                   # [k, ..., T]
    return jnp.moveaxis(y, 0, -1)                      # [..., T, k]
