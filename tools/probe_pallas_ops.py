"""Probe: does Mosaic lower every op the fused SPV kernel needs?

Compiles one tiny kernel on the real TPU exercising: arctan2, sqrt,
jnp.roll (sublane axis), pltpu.roll, lane-edge masking via
broadcasted_iota, [1,B]->[F,B] sublane broadcast from VMEM scratch,
[F,1]->[F,B] lane broadcast, dot with precision=HIGHEST, grid carry in
scratch with @pl.when reset, and mod/floor wrapping.
"""
import sys, os, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F, B = 128, 512


def kernel(x_ref, w_ref, o_ref, carry):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    x = x_ref[0]                      # [F, B]
    w = w_ref[:]                      # [F, B]
    tri = (jax.lax.broadcasted_iota(jnp.int32, (F, F), 0)
           >= jax.lax.broadcasted_iota(jnp.int32, (F, F), 1)
           ).astype(jnp.float32)
    delta = x[0:1, :128]              # [1, 128] row
    trid = tri * delta                # lane broadcast
    s = jnp.dot(trid, w[:, :], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)      # [F, B]
    s = s + carry[0:1, :]             # sublane broadcast from scratch
    # manual atan2 building blocks (atan2/atan are not lowered by Mosaic)
    y_, x_ = s, jnp.sqrt(jnp.abs(w) + 1.0)
    ay, ax = jnp.abs(y_), jnp.abs(x_)
    z = jnp.minimum(ay, ax) / jnp.maximum(jnp.maximum(ay, ax), 1e-30)
    z2 = z * z
    at = z * (1.0 - 0.33 * z2)
    swap = ay > ax
    at = jnp.where(swap, (np.pi / 2) - at, at)
    at = jnp.where(x_ < 0, np.pi - at, at)
    ph = jnp.where(y_ < 0, -at, at) + jnp.cos(z)
    prev = pltpu.roll(ph, 1, axis=0)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (F, B), 0) == 0
    prev = jnp.where(row0, carry[0:1, :], prev)
    col = jax.lax.broadcasted_iota(jnp.int32, (F, B), 1)
    left = pltpu.roll(ph, 1, axis=1)
    edge = ph[:, 1:2]                 # [F, 1] column
    left = jnp.where(col == 0, 2.0 * edge, left)
    wrapped = ph - prev - jnp.floor(ph - prev + 0.5)
    out = wrapped + left + jnp.mod(s, 1.0)
    o_ref[0] = out
    carry[:] = out[F - 1:F, :]


def main():
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, F, B)).astype(np.float32))
    w = jnp.asarray(np.random.default_rng(1).normal(
        size=(F, B)).astype(np.float32))
    out = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[
            pl.BlockSpec((1, F, B), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, B), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, F, B), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, F, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, B), jnp.float32)],
    )(x, w)
    out.block_until_ready()
    print(json.dumps({"ok": True, "sum": float(jnp.sum(out))}))


if __name__ == "__main__":
    main()
