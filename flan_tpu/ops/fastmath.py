"""Fast VPU-friendly transcendental replacements.

atan2: XLA's TPU arctan2 lowering measured ~25% of the ENTIRE headline
stretch pipeline (tools/profile_headline_stages.py: dropping the polar
extraction moved 150 s from 334.7 ms to 250.9 ms while the rfft itself
was only ~46 ms). The degree-15 odd minimax polynomial below (the same
one ops/spv_pallas.py uses inside Mosaic, where arctan2 does not lower
at all) is pure mul/add on the VPU with max error 7.5e-8 on atan and
~1.5e-7 rad through the quadrant logic — for the phase vocoder that is
~9e-6 Hz at the default analysis rate, five orders below the 0.05 Hz
golden-test gates (tests/test_reference_golden.py).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# atan(z) ~= z * P(z^2), z in [0, 1]; Chebyshev-fit, max err 7.5e-8
_ATAN_COEF = (0.9999999, -0.3333196, 0.19969235, -0.14016585,
              0.09906097, -0.0593671, 0.02416619, -0.004668773)


def atan_poly(z):
    z2 = z * z
    p = jnp.float32(_ATAN_COEF[-1])
    for c in _ATAN_COEF[-2::-1]:
        p = p * z2 + jnp.float32(c)
    return z * p


def sincos_2pi(u):
    """(sin(2 pi u), cos(2 pi u)) for u in cycles, any range.

    Quadrant reduction to |r| <= 1/8 cycle plus odd/even Taylor forms
    whose truncation error at pi/4 is ~2e-9; measured end-to-end error
    is ~4e-7 (f32 rounding through the reduction and polynomial, a few
    result ulps). The quadrant rotate is a 4-way select, all VPU
    mul/add/where. Intended for the phase-accumulator synthesis paths
    whose angles are already mod-1 cycles, replacing two XLA
    transcendental lowerings."""
    k = jnp.round(u * 4.0)
    r = (u - k * jnp.float32(0.25)) * jnp.float32(2.0 * np.pi)
    z = r * r
    # sin(r) = r (1 + z (s1 + z (s2 + z s3))), cos(r) = 1 + z (c1 + ...)
    s = r * (jnp.float32(1.0) + z * (jnp.float32(-1.0 / 6.0)
             + z * (jnp.float32(1.0 / 120.0)
                    + z * jnp.float32(-1.0 / 5040.0))))
    c = (jnp.float32(1.0) + z * (jnp.float32(-0.5)
         + z * (jnp.float32(1.0 / 24.0)
                + z * (jnp.float32(-1.0 / 720.0)
                       + z * jnp.float32(1.0 / 40320.0)))))
    q = jnp.mod(k, 4.0)
    sin = jnp.where(q == 0, s,
                    jnp.where(q == 1, c,
                              jnp.where(q == 2, -s, -c)))
    cos = jnp.where(q == 0, c,
                    jnp.where(q == 1, -s,
                              jnp.where(q == 2, -c, s)))
    return sin, cos


def atan2(y, x):
    """Four-quadrant atan2 from the [0,1] polynomial; matches
    jnp.arctan2 to ~1.5e-7 for finite inputs, (0,0) excluded (callers
    gate zero-energy points, as the polar extractions do)."""
    ay, ax = jnp.abs(y), jnp.abs(x)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    z = lo / jnp.maximum(hi, jnp.float32(1e-37))
    at = atan_poly(z)
    at = jnp.where(ay > ax, jnp.float32(np.pi / 2) - at, at)
    at = jnp.where(x < 0, jnp.float32(np.pi) - at, at)
    return jnp.where(y < 0, -at, at)
