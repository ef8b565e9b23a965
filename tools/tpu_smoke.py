"""On-chip numerics tier (VERDICT r3 item 7): SNR gates on the REAL TPU.

The whole pytest suite runs forced-CPU, and CLAUDE.md documents that TPU
DEFAULT matmul precision truncates f32 operands to bf16 (~51 dB SNR) — a
dropped `precision=HIGH[EST]` on any accuracy-relevant einsum ships green
on CPU and silently degrades on the chip. This tool is the gate: it runs
the precision-sensitive paths on whatever backend jax selects (the real
chip under axon; also meaningful forced-CPU for calibration) and asserts
committed SNR thresholds.

Usage:  python tools/tpu_smoke.py            # all gates, one JSON line
        python tools/tpu_smoke.py fft spv    # subset

Exit code 0 iff every gate passes. Thresholds sit ~10 dB under the
clean measured values (see GATES) so tunnel noise never flakes them, but
a bf16 collapse (40-70 dB drop on the FFT/resample gates) always trips.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _snr_db(ref, got, fit_scale=True):
    """SNR of got vs ref after an optimal scalar fit (insensitive to the
    documented OLA gain conventions, sensitive to everything else)."""
    ref = np.asarray(ref, np.float64).ravel()
    got = np.asarray(got, np.float64).ravel()
    n = min(len(ref), len(got))
    ref, got = ref[:n], got[:n]
    if fit_scale:
        denom = float(got @ got)
        s = float(ref @ got) / denom if denom > 0 else 1.0
        got = got * s
    err = float(((ref - got) ** 2).mean())
    sig = float((ref ** 2).mean())
    return 10.0 * np.log10(max(sig, 1e-300) / max(err, 1e-300))


def _aligned_snr_db(ref, got, guard=4096, n2=1 << 17):
    """Cross-correlation-aligned SNR (the fused SPV path carries a ~34
    sample group-delay lead; docs/STATUS.md)."""
    ref = np.asarray(ref, np.float64).ravel()
    got = np.asarray(got, np.float64).ravel()
    aa = ref[guard:-guard]
    xc = np.fft.irfft(np.fft.rfft(aa, n2).conj()
                      * np.fft.rfft(got[guard:-guard], n2), n2)
    lag = int(np.argmax(xc))
    if lag > n2 // 2:
        lag -= n2
    bb = got[guard + lag: guard + lag + len(aa)]
    if len(bb) < len(aa):
        aa = aa[:len(bb)]
    return _snr_db(aa, bb)


def gate_fft():
    """MXU block-real Cooley-Tukey rfft vs numpy (precision=HIGHEST
    einsums; ops/mxu_fft.py). bf16 collapse lands at ~51 dB."""
    import jax.numpy as jnp
    from flan_tpu.ops import mxu_fft
    rng = np.random.default_rng(0)
    x = rng.standard_normal((128, 4096)).astype(np.float32)
    re, im = mxu_fft.rfft_mxu(jnp.asarray(x), 4096)
    got = np.asarray(re) + 1j * np.asarray(im)
    ref = np.fft.rfft(x)
    err = np.abs(got - ref) ** 2
    sig = np.abs(ref) ** 2
    return 10.0 * np.log10(sig.mean() / max(err.mean(), 1e-300))


def gate_pv_roundtrip():
    """Audio -> PV -> Audio identity (the reference's own fidelity oracle,
    AudioInformation.cpp:131-136 uses energy difference; SNR is strictly
    stronger). Covers the forward STFT, phase vocoder, inverse scan, OLA."""
    import jax.numpy as jnp
    from flan_tpu.ops import stft
    sr = 44100.0
    n = int(10.0 * sr)
    t = np.arange(n, dtype=np.float32) / sr
    rng = np.random.default_rng(1)
    x = (0.4 * np.sin(2 * np.pi * 220.0 * t)
         + 0.05 * rng.standard_normal(n)).astype(np.float32)[None]
    mag, freq = stft.pv_forward(jnp.asarray(x), window_size=1024, hop=256,
                                dft_size=1024, sample_rate=sr)
    y = np.asarray(stft.pv_inverse(mag, freq, window_size=1024, hop=256,
                                   sample_rate=sr))[0]
    g = 4096
    return _snr_db(x[0][g:n - g], y[g:n - g])


def gate_spv():
    """SPV sliding-DFT round trip, aligned (fused path group delay)."""
    import jax.numpy as jnp
    from flan_tpu import Audio
    sr = 48000.0
    n = int(10.0 * sr)
    t = np.arange(n, dtype=np.float32) / sr
    x = (0.4 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)[None]
    a = Audio(data=jnp.asarray(x), sample_rate=sr)
    y = np.asarray(a.convert_to_SPV(512).convert_to_audio().data)[0]
    return _aligned_snr_db(x[0], y)


def gate_sqpv():
    """SQPV sliding constant-Q round trip, aligned."""
    import jax.numpy as jnp
    from flan_tpu import Audio
    sr = 48000.0
    n = int(5.0 * sr)
    t = np.arange(n, dtype=np.float32) / sr
    x = (0.4 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)[None]
    a = Audio(data=jnp.asarray(x), sample_rate=sr)
    sq = a.convert_to_SQPV((16.0, 24000.0), 24.0)
    y = np.asarray(sq.convert_to_audio().data)[0]
    return _aligned_snr_db(x[0], y, guard=8192)


def gate_resample():
    """44.1k -> 48k polyphase windowed-sinc (one einsum, precision=HIGH;
    ops/resample.py) vs the analytic target sine."""
    import jax.numpy as jnp
    from flan_tpu import Audio
    sr_in, sr_out = 44100.0, 48000.0
    n = int(2.0 * sr_in)
    t = np.arange(n, dtype=np.float32) / sr_in
    x = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)[None]
    out = Audio(data=jnp.asarray(x), sample_rate=sr_in).resample(sr_out)
    y = np.asarray(out.data)[0]
    m = len(y)
    t2 = np.arange(m, dtype=np.float64) / sr_out
    ref = 0.5 * np.sin(2 * np.pi * 440.0 * t2)
    g = 2048
    return _snr_db(ref[g:m - g], y[g:m - g])


def gate_stretch():
    """Headline fused stretch pipeline on a pure sine: the dominant
    output partial must stay at the input frequency with the rest of the
    spectrum suppressed (integration gate over forward+remap+inverse)."""
    import jax.numpy as jnp
    from flan_tpu.pipelines import pv_stretch_pipeline
    sr = 48000.0
    n = int(5.0 * sr)
    t = np.arange(n, dtype=np.float32) / sr
    x = np.stack([0.4 * np.sin(2 * np.pi * 220.0 * t),
                  0.4 * np.sin(2 * np.pi * 330.0 * t)]).astype(np.float32)
    y = np.asarray(pv_stretch_pipeline(jnp.asarray(x), 2.0,
                                       sample_rate=sr))
    g = 48000
    seg = y[0][g:g + (1 << 17)]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    peak_hz = np.argmax(spec) * sr / len(seg)
    inband = np.abs(np.fft.rfftfreq(len(seg), 1 / sr) - peak_hz) < 20.0
    sideband_db = 10 * np.log10(max((spec[~inband] ** 2).sum(), 1e-300)
                                / (spec[inband] ** 2).sum())
    if abs(peak_hz - 220.0) > 2.0:
        return -abs(peak_hz - 220.0)  # wrong partial: hard fail
    return -sideband_db  # dB of sideband suppression (higher = better)


# thresholds: clean CPU-calibrated values minus ~10 dB headroom; first
# real-chip run values recorded alongside in docs/STATUS.md.
GATES = {
    "fft": (gate_fft, 90.0),
    "pv_roundtrip": (gate_pv_roundtrip, 35.0),
    "spv": (gate_spv, 20.0),
    "sqpv": (gate_sqpv, 10.0),
    "resample": (gate_resample, 55.0),
    "stretch": (gate_stretch, 15.0),
}


def main():
    args = sys.argv[1:]
    import jax
    if "--cpu" in args:  # calibration mode: the axon sitecustomize
        args.remove("--cpu")  # overrides JAX_PLATFORMS (CLAUDE.md), so
        jax.config.update("jax_platforms", "cpu")  # force in-process
    names = args or list(GATES)
    results, ok = {}, True
    backend = jax.devices()[0].platform
    for name in names:
        fn, thresh = GATES[name]
        try:
            val = float(fn())
            passed = val >= thresh
        except Exception as e:  # noqa: BLE001 - report, don't crash the tier
            val, passed = None, False
            results[name] = {"error": f"{type(e).__name__}: {e}"[:200],
                             "threshold_db": thresh, "ok": False}
            ok = False
            continue
        results[name] = {"measured_db": round(val, 1),
                         "threshold_db": thresh, "ok": bool(passed)}
        ok = ok and passed
    print(json.dumps({"ok": ok, "backend": backend, "gates": results}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
