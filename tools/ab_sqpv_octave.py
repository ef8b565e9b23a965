"""A/B: per-octave decimated SQPV vs the exact full-rate path (VERDICT
round 4 item 4 / round 5 scope of docs/NEXT.md item 2).

The decomposition under test: all octaves of a constant-Q analysis share
the same RELATIVE geometry — bin k of octave o at the decimated rate
sr/2^o has exactly the period (in samples) of bin k of octave 0 at sr.
So instead of one [T, 254]-bin transform with comb delays to ~100k
samples, run 2-per-octave-decimation and one 24-bin top-octave transform
per octave, each with delays <= ceil(2Q) ~ 69..137 samples:

    octave o: x -> halfband decimate^o -> SQPV(rate sr/2^o,
              bandwidth (f_max/2^{o+1}, f_max/2^o)) -> inverse ->
              polyphase upsample 2^o -> sum

Arithmetic (10 s mono 48k, (16, 24 kHz), 24 bpo — the bench_sqpv config):
  exact:  staged u (re+im) + mag/pitch out = T x 256 lanes x 16 B
          ~ 2.0 GB HBM walked by stage+fwd; inverse re-reads 1.0 GB.
  octave: sum_o T/2^o x 24 bins x 16 B = 48T x 16 B ~ 370 MB *if bins
          could stay 24 lanes wide*. They cannot: the Mosaic kernels tile
          bins to 128 lanes (ops/sqpv_pallas._F), so each octave stages
          and writes 128 lanes and the decomposed total is
          2T x 128 x 16 B ~ 2.0 GB — the lane floor exactly cancels the
          decimation win unless the comb fuses into the kernel as a
          short-delay VMEM ring (feasible ONLY in this decomposed form:
          delays <= 137 samples vs the exact path's 100k).
  This script measures the composition as it stands (shared public
  kernels, per-octave dispatches + resample chain) and its fidelity cost
  (decimation filters eat each octave's top edge). Semantics to preserve
  for any adopted variant: AudioSQPV.cpp:64-121.

Usage: python tools/ab_sqpv_octave.py exact|octave [SECONDS] [PER_OCTAVES]
Prints one JSON line. Subprocess-isolate per arm.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _aligned_snr_db(ref, got, guard=8192, n2=1 << 17):
    ref = np.asarray(ref, np.float64).ravel()
    got = np.asarray(got, np.float64).ravel()
    aa = ref[guard:-guard]
    xc = np.fft.irfft(np.fft.rfft(aa, n2).conj()
                      * np.fft.rfft(got[guard:-guard], n2), n2)
    lag = int(np.argmax(xc))
    if lag > n2 // 2:
        lag -= n2
    bb = got[guard + lag: guard + lag + len(aa)]
    aa = aa[:len(bb)]
    denom = float(bb @ bb)
    s = float(aa @ bb) / denom if denom > 0 else 1.0
    bb = bb * s
    err = float(((aa - bb) ** 2).mean())
    sig = float((aa ** 2).mean())
    return 10.0 * np.log10(max(sig, 1e-300) / max(err, 1e-300))


def main():
    arm = sys.argv[1]
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    per_octaves = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    import jax.numpy as jnp
    from flan_tpu import Audio

    sr, bpo = 48000.0, 24.0
    bw = (16.0, 24000.0)
    n = int(seconds * sr)
    t = np.arange(n, dtype=np.float32) / sr
    x = jnp.asarray((0.4 * np.sin(2 * np.pi * 440.0 * t))
                    .astype(np.float32))[None, :]
    a0 = Audio(data=x, sample_rate=sr)

    def sync(y):
        y.block_until_ready()
        float(jnp.sum(y[..., ::65536]))

    tiny = jnp.zeros((8,), jnp.float32) + 1.0
    tiny.block_until_ready()

    def floor_time(reps=5):
        f = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(tiny)
            f = min(f, time.perf_counter() - t0)
        return f

    if arm == "exact":
        def run():
            out = a0.convert_to_SQPV(bw, bpo).convert_to_audio()
            sync(out.data)
            return out
    else:
        f_max = bw[1]

        def run():
            # decimation chain: halve the rate per octave via the
            # polyphase resampler (flan's own op); dispatches pipeline
            # FIFO on the device, one sync at the end
            outs = []
            cur = a0
            for o in range(per_octaves):
                hi = f_max / (2.0 ** o)
                sq = cur.convert_to_SQPV((hi / 2.0, hi), bpo)
                y_o = sq.convert_to_audio()
                # back to the full rate for the sum
                for _ in range(o):
                    y_o = y_o.resample(y_o.sample_rate * 2.0)
                outs.append(y_o)
                cur = cur.resample(cur.sample_rate / 2.0)
            # remainder band (bw[0] .. f_max/2^per_octaves) in one exact
            # call at rate sr/2^per_octaves (band top at its Nyquist,
            # like every per-octave call)
            lo_hi = f_max / (2.0 ** per_octaves)
            if lo_hi > bw[0]:
                sq = cur.convert_to_SQPV((bw[0], lo_hi), bpo)
                y_o = sq.convert_to_audio()
                for _ in range(per_octaves):
                    y_o = y_o.resample(y_o.sample_rate * 2.0)
                outs.append(y_o)
            m = min(o.num_frames for o in outs)
            total = outs[0].data[:, :m]
            for y_o in outs[1:]:
                total = total + y_o.data[:, :m]
            total.block_until_ready()
            sync(total)
            return Audio(data=total, sample_rate=sr)

    out = run()  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = run()
        best = min(best, time.perf_counter() - t0)
    best = max(best - floor_time(), best * 0.25)

    y = np.asarray(out.data)[0]
    snr = _aligned_snr_db(np.asarray(x)[0], y)
    print(json.dumps({
        "arm": arm, "seconds": seconds,
        "per_octaves": per_octaves if arm == "octave" else None,
        "ms": round(best * 1e3, 1),
        "x_realtime": round(seconds / best, 1),
        "aligned_snr_db_vs_input": round(snr, 1)}))


if __name__ == "__main__":
    main()
