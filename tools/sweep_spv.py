"""One SPV/SQPV config per process (argv: kind chunk precision)."""
import sys, time, json
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
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


def main():
    kind, chunk, prec_name = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    prec = getattr(jax.lax.Precision, prec_name)
    sr = 48000.0
    if kind == "spv":
        from flan_tpu.spv.spv import spv_forward, spv_inverse
        seconds = 30.0
        n = int(seconds * sr)
        t = np.arange(n, dtype=np.float32) / sr
        x = jnp.asarray((0.4 * np.sin(2 * np.pi * 440.0 * t))[None])

        def run():
            mag, freq = spv_forward(x, 512, sr, chunk=chunk,
                                    cumsum_precision=prec)
            y = spv_inverse(mag, freq, sr)
            _sync(y)
            return y

        run()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        best = max(best - floor_s(), best * 0.25)
        y = np.asarray(run())[0]
        a = np.asarray(x)[0]
        g = 4096
        aa, bb = a[g:-g], y[g:-g]
        n2 = 1 << 17
        xc = np.fft.irfft(np.fft.rfft(aa, n2).conj()
                          * np.fft.rfft(bb, n2), n2)
        lag = int(np.argmax(xc))
        if lag > n2 // 2:
            lag -= n2
        bb = y[g + lag:g + lag + len(aa)]
        err = ((aa - bb) ** 2).mean()
        snr = 10 * np.log10((aa ** 2).mean() / max(err, 1e-30))
        print(json.dumps({"cfg": f"spv_c{chunk}_{prec_name}",
                          "xrt": round(seconds / best, 1),
                          "snr_db": round(float(snr), 1)}))
    else:
        from flan_tpu.sqpv.transform import sqpv_forward
        seconds = 10.0
        n = int(seconds * sr)
        t = np.arange(n, dtype=np.float32) / sr
        x = jnp.asarray((0.4 * np.sin(2 * np.pi * 440.0 * t))[None])

        def run():
            m, p, pos = sqpv_forward(x, sr, 24.0, (16.0, 24000.0),
                                     chunk=chunk, cumsum_precision=prec)
            _sync(m)

        run()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        best = max(best - floor_s(), best * 0.25)
        print(json.dumps({"cfg": f"sqpv_fwd_c{chunk}_{prec_name}",
                          "xrt": round(seconds / best, 1)}))


if __name__ == "__main__":
    main()
