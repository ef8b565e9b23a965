"""Headline benchmark: PV time-stretch pipeline throughput.

Measures the BASELINE.md north-star path — load -> convert_to_PV ->
stretch(2x) -> convert_to_audio — on 10 minutes of stereo 48 kHz audio and
reports x-realtime per chip. vs_baseline is the ratio against the 50x
real-time target (>= 1.0 beats the target).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from flan_tpu.pipelines import pv_stretch_pipeline

    sr = 48000.0
    seconds = 600.0          # 10-minute stereo file (BASELINE.md target row)
    window, hop, dft = 2048, 128, 4096
    stretch_factor = 2.0

    n = int(seconds * sr)
    rng = np.random.default_rng(0)
    t = np.arange(n, dtype=np.float32) / sr
    x = np.stack([
        0.4 * np.sin(2 * np.pi * 220.0 * t) + 0.1 * rng.standard_normal(n),
        0.4 * np.sin(2 * np.pi * 330.0 * t) + 0.1 * rng.standard_normal(n),
    ]).astype(np.float32)
    x = jnp.asarray(x)

    def pipeline(audio):
        return pv_stretch_pipeline(
            audio, stretch_factor, window_size=window, hop=hop,
            dft_size=dft, sample_rate=sr)

    # barrier: block_until_ready alone is unreliable through the remote
    # tunnel; a tiny device->host fetch guarantees completion.
    def run_and_sync(audio):
        y = pipeline(audio)
        y.block_until_ready()
        float(jnp.sum(y[..., ::65536]))
        return y

    run_and_sync(x)  # warmup / compile

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_and_sync(x)
        times.append(time.perf_counter() - t0)
    best = min(times)
    xrt = seconds / best
    target = 50.0
    print(json.dumps({
        "metric": "pv_stretch_x_realtime_10min_stereo_48k",
        "value": round(xrt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / target, 3),
    }))


if __name__ == "__main__":
    main()
