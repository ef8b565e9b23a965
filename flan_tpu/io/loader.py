"""Prefetching audio loader: overlap host decode with device compute.

The SURVEY.md native-component checklist calls for a "double-buffered
host->HBM loader" replacing libsndfile's synchronous reads: while the
device processes clip k, a background thread decodes clip k+1 (C++ codec
fast path, flan_tpu/native) and stages its samples onto the device, so
the accelerator never idles on disk or PCM decode.

Used by the CLI batch processor; safe anywhere - JAX device_put is
thread-safe for staging, and all jit dispatch stays on the caller's
thread.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Tuple


def iter_audio_prefetched(paths: Iterable[str],
                          depth: int = 2) -> Iterator[Tuple[str, object]]:
    """Yield (path, Audio) with up to `depth` clips decoded + staged ahead.

    Decode errors surface on the consuming thread at the failing item's
    turn, preserving input order.
    """
    import jax

    from flan_tpu.audio.audio import Audio

    paths = list(paths)
    q: queue.Queue = queue.Queue(maxsize=max(1, depth))
    _SENTINEL = object()
    stop = threading.Event()

    def _put(item) -> bool:
        # bounded put that gives up when the consumer went away, so an
        # abandoned iterator (break, or an error raised mid-stream) can
        # never leak a thread blocked on a full queue
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        for p in paths:
            if stop.is_set():
                return
            try:
                clip = Audio.load_from_file(p)
                # stage host samples onto the device now, off the main
                # thread, so the consumer's first op needs no H2D wait
                data = jax.device_put(clip.data)
                item = (p, clip._with(data=data), None)
            except Exception as e:  # surfaced in order on the consumer
                item = (p, None, e)
            if not _put(item):
                return
        _put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            p, clip, err = item
            if err is not None:
                raise RuntimeError(f"failed to load {p}") from err
            yield p, clip
    finally:
        stop.set()
        t.join()
