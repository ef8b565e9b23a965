"""A/B the SQPV Mosaic kernels' prefix-accumulation strategy on the
real chip.

Usage: python tools/ab_sqpv_kernel.py adopted|matmul|split3|cumsum [SECONDS]

"adopted" leaves the per-kernel defaults (_PREFIX_MODE_FWD/_INV) in
place; a named mode forces BOTH kernels to it.

Times the bench_sqpv config (10 s mono, bandwidth (16, 24000), 24
bins/octave) split into staging / forward kernel / inverse kernel, plus
the full public roundtrip, under the chosen _PREFIX_MODE
(ops/sqpv_pallas.py). Also reports max |mag| error of the forward vs a
small-scale scan oracle so an accuracy regression can't masquerade as a
win. Subprocess-isolate per arm (jit caches key on the static mode, but
a fresh process keeps timings clean).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    mode = sys.argv[1]
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    import jax
    import jax.numpy as jnp
    import flan_tpu.ops.sqpv_pallas as sp
    if mode != "adopted":
        sp._PREFIX_MODE = mode
    if len(sys.argv) > 3:
        sp._TPB = int(sys.argv[3])
    from flan_tpu.ops.sqpv_pallas import (_stage_fused, _forward_fused_core,
                                          sqpv_forward_fused,
                                          sqpv_inverse_fused)

    sr, bpo, bw = 48000.0, 24.0, (16.0, 24000.0)
    n = int(seconds * sr)
    rng = np.random.default_rng(0)
    t = np.arange(n, dtype=np.float32) / sr
    x = jnp.asarray((0.4 * np.sin(2 * np.pi * 220.0 * t)
                     + 0.1 * rng.standard_normal(n))
                    .astype(np.float32))[None, :]

    def sync(*ys):
        for y in ys:
            y.block_until_ready()
        float(jnp.sum(ys[0][..., ::65536]))

    tiny = jnp.zeros((8,), jnp.float32) + 1.0
    tiny.block_until_ready()

    def floor_time(reps=5):
        f = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(tiny)
            f = min(f, time.perf_counter() - t0)
        return f

    def best_time(fn, reps=3):
        fn()
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            b = min(b, time.perf_counter() - t0)
        # every standalone timed call pays the tunnel's device->host sync
        # floor (CLAUDE.md measurement rules); subtract it, bounded below
        return max(b - floor_time(), b * 0.2)

    # staging alone
    u_re, u_im = _stage_fused(x, sample_rate=sr, bins_per_octave=bpo,
                              bandwidth=bw)
    sync(u_re, u_im)
    t_stage = best_time(lambda: sync(*_stage_fused(
        x, sample_rate=sr, bins_per_octave=bpo, bandwidth=bw)))

    # forward kernel (incl. transpose) on pre-staged operands
    fwd_mode = sp._PREFIX_MODE_FWD if mode == "adopted" else mode

    def fwd():
        m, p, po = _forward_fused_core(
            x, u_re, u_im, sample_rate=sr, bins_per_octave=bpo,
            bandwidth=bw, prefix_mode=fwd_mode)
        sync(m, p)
        return m, p, po

    mag, pitch, positive = fwd()
    t_kern = best_time(lambda: fwd())

    # inverse kernel
    def inv():
        y = sqpv_inverse_fused(mag, pitch, positive, sample_rate=sr,
                               bins_per_octave=bpo, bandwidth=bw)
        sync(y)

    t_inv = best_time(inv)

    # accuracy vs the scan oracle on a short signal
    from flan_tpu.sqpv.transform import _sqpv_forward_scan
    xs = x[:, :48000]
    m_f, p_f, _ = sqpv_forward_fused(xs, sample_rate=sr,
                                     bins_per_octave=bpo, bandwidth=bw)
    m_s, p_s, _ = _sqpv_forward_scan(xs, sample_rate=sr,
                                     bins_per_octave=bpo, bandwidth=bw)
    m_f, m_s = np.asarray(m_f), np.asarray(m_s)
    scale = float(np.abs(m_s).max())
    mag_err = float(np.abs(m_f - m_s).max()) / scale
    live = np.asarray(m_s) > 1e-4 * scale
    p_fn, p_sn = np.asarray(p_f), np.asarray(p_s)
    freq_err = float(np.abs(np.where(live, p_fn - p_sn, 0.0)).max())

    print(json.dumps({
        "mode": mode, "seconds": seconds,
        "stage_ms": round(t_stage * 1e3, 1),
        "fwd_kernel_ms": round(t_kern * 1e3, 1),
        "inv_kernel_ms": round(t_inv * 1e3, 1),
        "roundtrip_x_realtime": round(
            seconds / (t_stage + t_kern + t_inv), 1),
        "mag_rel_err": mag_err, "pitch_abs_err_live": freq_err}))


if __name__ == "__main__":
    main()
