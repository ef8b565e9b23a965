"""Measure SPV forward vs inverse cost separately on the real chip.

Usage: python tools/spv_split_timing.py [chunk]
Prints one JSON line with fwd_s / inv_s / rt_s (floor-subtracted) and
x-realtime for each, to locate where the roundtrip budget goes before
optimizing either half.
"""
import sys, time, json, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp


def _sync(y):
    y.block_until_ready()
    float(jnp.sum(jnp.ravel(y)[::65536]))


def floor_s():
    tiny = jnp.zeros((8,), jnp.float32) + 1.0
    tiny.block_until_ready()
    f = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(tiny)
        f = min(f, time.perf_counter() - t0)
    return f


def timeit(fn, reps=2):
    # fn must not leave multi-GB results live: delete before returning.
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    fused = len(sys.argv) > 2 and sys.argv[2] == "fused"
    from flan_tpu.spv.spv import spv_forward, spv_inverse
    sr = 48000.0
    seconds = 30.0
    n = int(seconds * sr)
    t = np.arange(n, dtype=np.float32) / sr
    x = jnp.asarray((0.4 * np.sin(2 * np.pi * 440.0 * t))[None])

    fl = floor_s()

    def fwd_once():
        mag, freq = spv_forward(x, 512, sr, chunk=chunk, use_pallas=fused)
        _sync(mag)
        mag.delete(); freq.delete()

    fwd = timeit(fwd_once) - fl

    mag, freq = spv_forward(x, 512, sr, chunk=chunk, use_pallas=fused)
    _sync(mag)

    def inv_once():
        y = spv_inverse(mag, freq, sr, use_pallas=fused)
        _sync(y)
        y.delete()

    inv = timeit(inv_once) - fl

    # aligned SNR on the retained transform (fidelity guard)
    y = spv_inverse(mag, freq, sr, use_pallas=fused)
    _sync(y)
    yn = np.asarray(y)[0]
    mag.delete(); freq.delete()
    a = np.asarray(x)[0]
    g = 4096
    aa = a[g:-g]
    n2 = 1 << 17
    xc = np.fft.irfft(np.fft.rfft(aa, n2).conj()
                      * np.fft.rfft(yn[g:-g], n2), n2)
    lag = int(np.argmax(xc))
    if lag > n2 // 2:
        lag -= n2
    bb = yn[g + lag:g + lag + len(aa)]
    err = ((aa - bb) ** 2).mean()
    snr = 10 * np.log10((aa ** 2).mean() / max(err, 1e-30))

    def rt_once():
        m, f2 = spv_forward(x, 512, sr, chunk=chunk, use_pallas=fused)
        yy = spv_inverse(m, f2, sr, use_pallas=fused)
        _sync(yy)
        m.delete(); f2.delete(); yy.delete()

    rt = timeit(rt_once) - fl
    print(json.dumps({
        "chunk": chunk, "fused": fused, "snr_db": round(float(snr), 1),
        "floor_ms": round(fl * 1e3, 1),
        "fwd_ms": round(fwd * 1e3, 1), "fwd_x": round(seconds / fwd, 1),
        "inv_ms": round(inv * 1e3, 1), "inv_x": round(seconds / inv, 1),
        "rt_ms": round(rt * 1e3, 1), "rt_x": round(seconds / rt, 1)}))


if __name__ == "__main__":
    main()
