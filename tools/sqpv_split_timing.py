"""Split timing of the fused SQPV pipeline: staging | kernel | inverse.

Usage: python tools/sqpv_split_timing.py  (bench config: 10 s mono 48k,
bandwidth (16, 24000), 24 bins/octave). Each part is its own jit
program (deliberately - see ops/sqpv_pallas._stage_fused), so parts are
timed standalone with the sync floor subtracted.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp
    from flan_tpu.ops.sqpv_pallas import (_forward_fused_core, _stage_fused,
                                          sqpv_inverse_fused)

    sr, bpo, band = 48000.0, 24.0, (16.0, 24000.0)
    seconds = 10.0
    n = int(seconds * sr)
    rng = np.random.default_rng(0)
    t = np.arange(n, dtype=np.float32) / sr
    x = jnp.asarray((0.4 * np.sin(2 * np.pi * 220.0 * t)
                     + 0.1 * rng.standard_normal(n))[None].astype(np.float32))

    def sync(y):
        y.block_until_ready()
        float(jnp.sum(jnp.ravel(y)[::65536]))

    def floor_s():
        tiny = jnp.zeros((8,), jnp.float32) + 1.0
        tiny.block_until_ready()
        f = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            sync(tiny)
            f = min(f, time.perf_counter() - t0)
        return f

    def best(fn, reps=3):
        fn()
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            b = min(b, time.perf_counter() - t0)
        return max(b - floor_s(), b * 0.25)

    kw = dict(sample_rate=sr, bins_per_octave=bpo, bandwidth=band)
    u_re, u_im = _stage_fused(x, **kw)
    sync(u_re)
    t_stage = best(lambda: sync(_stage_fused(x, **kw)[0]))
    mag, pit, pos = _forward_fused_core(x, u_re, u_im, **kw)
    sync(mag)
    t_kern = best(lambda: sync(_forward_fused_core(x, u_re, u_im, **kw)[0]))
    y = sqpv_inverse_fused(mag, pit, pos, **kw)
    sync(y)
    t_inv = best(lambda: sync(sqpv_inverse_fused(mag, pit, pos, **kw)))
    print(json.dumps({
        "stage_ms": round(t_stage * 1e3, 1),
        "kernel_ms": round(t_kern * 1e3, 1),
        "inverse_ms": round(t_inv * 1e3, 1),
        "sum_x_realtime": round(seconds / (t_stage + t_kern + t_inv), 1)}))


if __name__ == "__main__":
    main()
