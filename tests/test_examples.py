"""The examples/ scripts stay runnable (each is public documentation)."""
import os
import sys

import numpy as np
import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")
sys.path.insert(0, EXAMPLES)


def test_match_eq_recovers_cutoff():
    import match_eq
    found = match_eq.main(["--steps", "40"])
    assert abs(found - 900.0) < 250


def test_stretch_large_file_demo(tmp_path):
    import stretch_large_file
    out = stretch_large_file.main([])
    assert out.num_frames > 7 * 8000  # ~2x of 4 s at 8 kHz
    # file-arg path
    from flan_tpu import Audio
    p_in = str(tmp_path / "in.wav")
    t = np.arange(8000, dtype=np.float32) / 8000.0
    Audio.create_from_array(
        (0.3 * np.sin(2 * np.pi * 440 * t))[None], 8000.0).save_to_file(p_in)
    p_out = str(tmp_path / "out.wav")
    out2 = stretch_large_file.main([p_in, p_out, "1.5"])
    assert os.path.exists(p_out)
    assert abs(out2.num_frames - 1.5 * 8000) < 1000


def test_batch_over_mesh():
    import batch_over_mesh
    outs = batch_over_mesh.main(["6"])
    assert outs.shape[0] == 6
    assert np.isfinite(outs).all()
