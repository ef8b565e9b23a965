"""Microbench one case (argv: name) — subprocess-isolated.

Cases time K chained calls inside one jit (CLAUDE.md measurement rules)
with the sync floor subtracted.
"""
import sys, time, json
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
import functools


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


def timeit(fn, x, reps=3):
    fn(x)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(x))
        best = min(best, time.perf_counter() - t0)
    return max(best - floor_s(), best * 0.25)


K = 8


def chain(one):
    @jax.jit
    def f(x):
        def body(c, _):
            y = one(c)
            # feed a perturbed input forward so XLA can't CSE the chain
            return c + jnp.sum(y) * 1e-12, None
        out, _ = jax.lax.scan(body, x, None, length=K)
        return out
    return f


def main():
    case = sys.argv[1]
    if case.startswith("rfft_mxu_") or case.startswith("rfft_xla_"):
        n = int(case.rsplit("_", 1)[1])
        batch = max(1, (36 * 131072) // n)  # constant total points
        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((batch, n)).astype(np.float32))
        if case.startswith("rfft_mxu_"):
            from flan_tpu.ops.mxu_fft import rfft_mxu

            def one(v):
                r, i = rfft_mxu(v, n)
                return r + i
        else:
            def one(v):
                s = jnp.fft.rfft(v, n=n, axis=-1)
                return s.real + s.imag
        t = timeit(chain(one), x) / K
        print(json.dumps({"case": case, "ms": round(t * 1e3, 2),
                          "batch": batch}))
    elif case == "conv_old" or case.startswith("conv_os_"):
        n, m, c = 1440000, 48000, 2
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((c, n)).astype(np.float32))
        h = jnp.asarray((rng.standard_normal((c, m))
                         * np.exp(-np.arange(m) / 8000.0)).astype(np.float32))
        if case == "conv_old":
            from flan_tpu.core.types import power_of_2_container
            dft = 2 * power_of_2_container(max(n, m))

            @jax.jit
            def f(x):
                spec = (jnp.fft.rfft(x, n=dft, axis=-1)
                        * jnp.fft.rfft(h, n=dft, axis=-1))
                return jnp.fft.irfft(spec, n=dft, axis=-1)[:, :n + m]
        else:
            import flan_tpu.ops.fft_conv as fc
            which = case.split("_")[-1]
            if which != "mxu":
                # overlap-save with XLA native block FFTs
                def f_body(x):
                    dft, step, nb = fc._plan(n, m)
                    total = (nb - 1) * step + dft
                    xp = jnp.pad(x, [(0, 0), (m - 1, total - (m - 1) - n)])
                    blocks = jnp.stack(
                        [jax.lax.slice(xp, (0, i * step), (c, i * step + dft))
                         for i in range(nb)], axis=1)
                    hs = jnp.fft.rfft(h, n=dft, axis=-1)
                    xs = jnp.fft.rfft(blocks, n=dft, axis=-1)
                    y = jnp.fft.irfft(xs * hs[:, None, :], n=dft, axis=-1)
                    return y[:, :, m - 1:].reshape(c, nb * step)[:, :n + m]
                f = jax.jit(f_body)
            else:
                f = jax.jit(lambda v: fc.fft_convolve_full(v, h))
        t = timeit(f, x)
        print(json.dumps({"case": case, "ms": round(t * 1e3, 1)}))
    else:
        print(json.dumps({"case": case, "error": "unknown"}))


if __name__ == "__main__":
    main()
