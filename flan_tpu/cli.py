"""Command-line batch processor: the production "render files" surface.

The reference is a library only (its flanTest.cpp scratchpad is the sole
executable); deployment-shaped workloads - render a playlist, regenerate a
sample library - want a process-level entry point that amortizes compiles
across files. Ops that share parameters reuse one jitted program, and
multiple inputs of like shape batch data-parallel over the device mesh
(flan_tpu.parallel.batch).

Usage:
    python -m flan_tpu stretch --factor 2.0 out_dir in1.wav in2.wav ...
    python -m flan_tpu repitch --factor 1.5 out_dir in.wav
    python -m flan_tpu morph --amount 0.5 out_dir a.wav b.wav
    python -m flan_tpu filter-lowpass --cutoff 2000 --order 2 out_dir in.wav
    python -m flan_tpu resample --rate 48000 out_dir in.wav
    python -m flan_tpu spectrogram out_dir in.wav        # BMP per input
"""
from __future__ import annotations

import argparse
import os
import sys
from typing import List


def _out_paths(out_dir: str, in_paths: List[str],
               suffix: str = ".wav") -> List[str]:
    """Collision-free output names: inputs from different directories with
    the same basename get _1, _2, ... suffixes instead of silently
    overwriting each other."""
    seen = {}
    out = []
    for p in in_paths:
        base = os.path.splitext(os.path.basename(p))[0]
        k = seen.get(base, 0)
        seen[base] = k + 1
        name = base if k == 0 else f"{base}_{k}"
        out.append(os.path.join(out_dir, name + suffix))
    return out


def _load(paths: List[str]):
    # prefetching loader: decode + device staging of clip k+1 overlaps
    # compute on clip k (SURVEY.md native checklist: host->HBM loader)
    from flan_tpu.io.loader import iter_audio_prefetched
    clips = []
    try:
        for p, c in iter_audio_prefetched(paths):
            if c.is_null():
                raise SystemExit(f"could not read {p}")
            clips.append(c)
    except RuntimeError as e:
        # the prefetch thread wraps decode errors (unreadable/corrupt
        # files) in RuntimeError; surface them like the is_null path
        raise SystemExit(f"could not read: {e}") from e
    return clips


def _save_all(clips, paths, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for clip, q in zip(clips, _out_paths(out_dir, paths)):
        clip.save_to_file(q)
        print(q)


def _maybe_batch(make_fn, clips, paths, out_dir, cancel=None):
    """Several clips of equal shape AND sample rate: shard the batch over
    the mesh (zero collectives). Otherwise run clips directly, each with
    its own sample rate - batching mixed lengths would zero-pad the
    shorter ones, and a shared transform must not bake in clip 0's rate.

    make_fn(sample_rate) -> jittable [C, N] -> [C, M] transform.
    cancel: optional flan_tpu.utils.cancel.CancelToken, polled between
    clip dispatches (the host-side flan_CANCEL_POINT analog; see
    utils/cancel.py for the design decision).
    """
    import jax
    from flan_tpu import Audio
    if cancel is not None:
        cancel.check()
    keys = {(c.num_channels, c.num_frames, c.sample_rate) for c in clips}
    if len(clips) > 1 and len(jax.devices()) > 1 and len(keys) == 1:
        from flan_tpu.parallel.batch import map_sharded
        sr = clips[0].sample_rate
        outs = map_sharded(make_fn(sr), [c.data for c in clips])
        rendered = [Audio(data=out, sample_rate=sr) for out in outs]
        _save_all(rendered, paths, out_dir)
    else:
        rendered = []
        for c in clips:
            if cancel is not None:
                cancel.check()
            rendered.append(c._with(data=make_fn(c.sample_rate)(c.data)))
        _save_all(rendered, paths, out_dir)


def main(argv=None, cancel=None) -> int:
    """cancel: optional flan_tpu.utils.cancel.CancelToken honored between
    clip dispatches (see utils/cancel.py for the design decision)."""
    ap = argparse.ArgumentParser(
        prog="flan_tpu", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("stretch", help="PV time stretch (fused streaming)")
    p.add_argument("--factor", type=float, required=True)
    p.add_argument("out_dir")
    p.add_argument("inputs", nargs="+")

    p = sub.add_parser("repitch", help="PV pitch scale (fused streaming)")
    p.add_argument("--factor", type=float, required=True)
    p.add_argument("out_dir")
    p.add_argument("inputs", nargs="+")

    p = sub.add_parser("morph", help="spectral morph of two inputs")
    p.add_argument("--amount", type=float, default=0.5)
    p.add_argument("out_dir")
    p.add_argument("inputs", nargs=2)

    p = sub.add_parser("filter-lowpass", help="Butterworth lowpass")
    p.add_argument("--cutoff", type=float, required=True)
    p.add_argument("--order", type=int, default=2)
    p.add_argument("out_dir")
    p.add_argument("inputs", nargs="+")

    p = sub.add_parser("resample", help="rational polyphase resample")
    p.add_argument("--rate", type=float, required=True)
    p.add_argument("out_dir")
    p.add_argument("inputs", nargs="+")

    p = sub.add_parser("spectrogram", help="render spectrogram BMPs")
    p.add_argument("out_dir")
    p.add_argument("inputs", nargs="+")

    p = sub.add_parser("convolve", help="FFT convolution with an IR file")
    p.add_argument("--ir", required=True, help="impulse-response WAV")
    p.add_argument("out_dir")
    p.add_argument("inputs", nargs="+")

    p = sub.add_parser("granulate",
                       help="granular resynthesis (dense batched grains)")
    p.add_argument("--length", type=float, required=True,
                   help="output length, seconds")
    p.add_argument("--grains-per-second", type=float, default=20.0)
    p.add_argument("--grain-length", type=float, default=0.1)
    p.add_argument("--scan-rate", type=float, default=1.0,
                   help="source read rate (selection = rate * t)")
    p.add_argument("--fade", type=float, default=0.01)
    p.add_argument("--scatter", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("out_dir")
    p.add_argument("inputs", nargs="+")

    p = sub.add_parser(
        "eq", help="whole-signal spectral EQ (Spectrum.multiply): "
                   "brick-wall band-pass between --low and --high Hz")
    p.add_argument("--low", type=float, default=0.0)
    p.add_argument("--high", type=float, default=1e9)
    p.add_argument("out_dir")
    p.add_argument("inputs", nargs="+")

    p = sub.add_parser(
        "wavetable", help="pitch-tracked wavetable resynthesis: extract a "
                          "table from each input, replay at --freq Hz "
                          "scanning the table over the output")
    p.add_argument("--length", type=float, required=True,
                   help="output length, seconds")
    p.add_argument("--freq", type=float, default=110.0)
    p.add_argument("out_dir")
    p.add_argument("inputs", nargs="+")

    p = sub.add_parser("stereo-delay",
                       help="cross-feedback stereo delay (stereo inputs)")
    p.add_argument("--length", type=float, required=True,
                   help="output length, seconds")
    p.add_argument("--l-time", type=float, required=True)
    p.add_argument("--r-time", type=float, required=True)
    p.add_argument("--decay", type=float, default=0.5)
    p.add_argument("out_dir")
    p.add_argument("inputs", nargs="+")

    args = ap.parse_args(argv)
    from flan_tpu import Audio

    if args.cmd == "stretch":
        clips = _load(args.inputs)
        from flan_tpu.pipelines import pv_stretch_pipeline
        _maybe_batch(
            lambda sr: (lambda x: pv_stretch_pipeline(
                x, args.factor, sample_rate=float(sr))),
            clips, args.inputs, args.out_dir, cancel)
    elif args.cmd == "repitch":
        clips = _load(args.inputs)
        from flan_tpu.pipelines import pv_repitch_pipeline
        _maybe_batch(
            lambda sr: (lambda x: pv_repitch_pipeline(
                x, args.factor, sample_rate=float(sr))),
            clips, args.inputs, args.out_dir, cancel)
    elif args.cmd == "morph":
        a, b = _load(args.inputs)
        if a.sample_rate != b.sample_rate:
            raise SystemExit(
                f"morph inputs must share a sample rate "
                f"({a.sample_rate:g} vs {b.sample_rate:g}); resample first")
        from flan_tpu.pipelines import pv_morph_pipeline
        out = pv_morph_pipeline(a.data, b.data, args.amount,
                                sample_rate=float(a.sample_rate))
        os.makedirs(args.out_dir, exist_ok=True)
        q = _out_paths(args.out_dir, [args.inputs[0]], "_morph.wav")[0]
        a._with(data=out).save_to_file(q)
        print(q)
    elif args.cmd == "filter-lowpass":
        clips = _load(args.inputs)
        rendered = [c.filter_2pole_lowpass(args.cutoff, 0.5, args.order)
                    for c in clips]
        _save_all(rendered, args.inputs, args.out_dir)
    elif args.cmd == "resample":
        clips = _load(args.inputs)
        rendered = [c.resample(args.rate) for c in clips]
        _save_all(rendered, args.inputs, args.out_dir)
    elif args.cmd == "spectrogram":
        clips = _load(args.inputs)
        os.makedirs(args.out_dir, exist_ok=True)
        for c, q in zip(clips, _out_paths(args.out_dir, args.inputs,
                                          ".bmp")):
            c.convert_to_PV().convert_to_graph().save_image(q)
            print(q)
    elif args.cmd == "convolve":
        ir = _load([args.ir])[0]
        clips = _load(args.inputs)
        rendered = []
        for c in clips:
            if cancel is not None:
                cancel.check()
            rendered.append(c.convolve(ir))
        _save_all(rendered, args.inputs, args.out_dir)
    elif args.cmd == "granulate":
        clips = _load(args.inputs)
        rate = args.scan_rate
        rendered = []
        for c in clips:
            if cancel is not None:
                cancel.check()
            rendered.append(c.granulate(
                args.length, args.grains_per_second, args.scatter,
                lambda t: rate * t, args.grain_length, args.fade,
                seed=args.seed))
        _save_all(rendered, args.inputs, args.out_dir)
    elif args.cmd == "eq":
        import numpy as np
        from flan_tpu.spectrum import Spectrum
        clips = _load(args.inputs)
        rendered = []
        for c in clips:
            if cancel is not None:
                cancel.check()
            spec = c.convert_to_spectrum()
            n = 2 * (spec.num_bins - 1)
            f = np.arange(spec.num_bins) * (c.sample_rate / n)
            mask = ((f >= args.low) & (f <= args.high)).astype(np.complex64)
            rendered.append(spec.multiply(
                Spectrum(data=mask[None],
                         sample_rate=c.sample_rate)).convert_to_audio())
        _save_all(rendered, args.inputs, args.out_dir)
    elif args.cmd == "wavetable":
        from flan_tpu.wavetable import Wavetable
        clips = _load(args.inputs)
        rendered = []
        for c in clips:
            if cancel is not None:
                cancel.check()
            wt = Wavetable(c)
            if wt.is_null():
                raise SystemExit("wavetable extraction found no waveforms "
                                 "(input too short or unpitched)")
            # ratio is [0, 1] start-to-end of the table (Wavetable.h:81);
            # stop just short of 1: the reference's table keeps one
            # all-zero slot past the last resampled cycle and r=1 lands
            # on it (Wavetable.cpp:77-88)
            rendered.append(wt.synthesize(
                args.length, args.freq,
                lambda t, _l=args.length: 0.98 * t / _l))
        _save_all(rendered, args.inputs, args.out_dir)
    elif args.cmd == "stereo-delay":
        clips = _load(args.inputs)
        rendered = []
        for c in clips:
            if cancel is not None:
                cancel.check()
            out = c.stereo_delay(args.length, args.l_time, args.r_time,
                                 args.decay)
            if out.is_null():
                raise SystemExit(
                    "stereo-delay requires stereo inputs with positive "
                    "delay times")
            rendered.append(out)
        _save_all(rendered, args.inputs, args.out_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
