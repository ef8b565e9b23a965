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

    A: [..., T, k, k], b: [..., T, k], y0: [..., k]. Scans along the T axis
    (axis -3 of A / -2 of b). The per-step compose is a k x k matmul on the
    VPU; k is 2 for the reference's 2-pole SVF state (s1, s2).
    """
    def combine(l, r):
        Al, bl = l
        Ar, br = r
        return (jnp.einsum("...ij,...jk->...ik", Ar, Al),
                jnp.einsum("...ij,...j->...i", Ar, bl) + br)

    AA, bb = jax.lax.associative_scan(combine, (A, b), axis=A.ndim - 3)
    return jnp.einsum("...tij,...j->...ti", AA, y0) + bb
