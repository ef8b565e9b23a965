"""Mechanical API-parity audit against the reference headers.

Fails if any live (non-commented) public method of the reference's Audio,
PV, SPV, SQPV, or Wavetable classes has no flan_tpu equivalent and is not
on the explicit allowlist (tools/parity_audit.py documents every
deliberate absence and rename with its reason).
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

REF = os.environ.get("FLAN_REFERENCE", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available")


def test_no_live_method_gaps():
    import parity_audit
    gaps, _dormant = parity_audit.audit()
    assert not gaps, f"reference methods missing from flan_tpu: {gaps}"


def test_allowlist_entries_are_really_absent():
    """Keep the allowlist honest: once a method is implemented it must be
    removed from ALLOW_MISSING so regressions are caught again."""
    import parity_audit
    for cls_name, entries in parity_audit.ALLOW_MISSING.items():
        cls = parity_audit.flan_class(cls_name)
        for m in entries:
            ok = (m not in dir(cls))
            if not ok:
                # present but deliberately raising (e.g. play) also counts
                import inspect
                src = inspect.getsource(getattr(cls, m))
                ok = "NotImplementedError" in src
            assert ok, f"{cls_name}.{m} exists; drop it from ALLOW_MISSING"


def test_sample_function_over_domain_surfaces():
    from flan_tpu import Audio, PV
    sr = 8000.0
    a = Audio.create_from_array(
        np.zeros((1, 800), np.float32), sr)
    s = a.sample_function_over_domain(0.25)
    assert s.is_constant and s.get_constant() == 0.25
    s2 = a.sample_function_over_domain(lambda t: t)
    arr = np.asarray(s2.as_array())
    assert arr.shape == (800,)
    assert abs(arr[799] - 799 / sr) < 1e-6

    pv = a.convert_to_PV(256, 64, 256)
    g = pv.sample_function_over_domain(lambda t, f: t + f)
    ga = np.asarray(g.as_array())
    assert ga.shape == (pv.num_frames, pv.num_bins)
    assert abs(ga[1, 1] - (1 / pv.analysis_rate + pv.bin_width)) < 1e-4
    tvals = pv.sample_function_over_time_domain(lambda t: 2.0 * t)
    ta = np.asarray(tvals.as_array())
    assert ta.shape == (pv.num_frames,)
    assert abs(ta[2] - 2.0 * 2 / pv.analysis_rate) < 1e-6
