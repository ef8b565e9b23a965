"""Headline stretch with argv[1] = mxu|xla FFT backend."""
import sys, time, json
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
import flan_tpu.ops.stft as stft

stft.USE_MXU_FFT = (sys.argv[1] == "mxu")


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


from flan_tpu.pipelines import pv_stretch_pipeline

seconds = 600.0
sr = 48000.0
n = int(seconds * sr)
rng = np.random.default_rng(0)
t = np.arange(n, dtype=np.float32) / sr
x = jnp.asarray(np.stack([
    0.4 * np.sin(2 * np.pi * 220.0 * t) + 0.1 * rng.standard_normal(n),
    0.4 * np.sin(2 * np.pi * 330.0 * t) + 0.1 * rng.standard_normal(n),
]).astype(np.float32))


def run():
    _sync(pv_stretch_pipeline(x, 2.0, window_size=2048, hop=128,
                              dft_size=4096, sample_rate=48000.0))


run()
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    run()
    best = min(best, time.perf_counter() - t0)
best = max(best - floor_s(), best * 0.25)
print(json.dumps({"cfg": f"headline_{sys.argv[1]}",
                  "xrt": round(seconds / best, 1)}))
