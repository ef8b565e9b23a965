"""API-parity audit: diff reference header method lists against flan_tpu.

Parses the public method declarations out of the reference's class headers
(reference: src/flan/Audio/Audio.h, PV/PV.h, SPV/SPV.h, SQPV/SQPV.h,
Wavetable.h, Graph.h, Function.h) and checks that every method has an
equivalent attribute on the corresponding flan_tpu class, plus Function.h's
free-function surface (ADSR, waveforms). Deliberate absences and renames
live in the explicit allowlists below, each with the reason.

Run directly (`python tools/parity_audit.py`) or via
tests/test_api_parity.py, which fails CI on any new gap.
"""
from __future__ import annotations

import os
import re
import sys
from typing import Dict, List, Set, Tuple

REF = os.environ.get("FLAN_REFERENCE", "/root/reference")

# C++ keywords / false positives the declaration regex may catch.
_STOPWORDS = {
    "if", "for", "while", "switch", "return", "static_assert", "sizeof",
    "defined", "decltype", "alignof", "assert", "operator",
    # C++ type keywords that appear as casts in member initializers
    "float", "int", "double", "bool", "size_t", "uint32_t",
}

# methods that legitimately have no flan_tpu equivalent, with reasons
ALLOW_MISSING: Dict[str, Dict[str, str]] = {
    "Audio": {
        "play": "win32-only in the reference (AudioBuffer.h:220-222); "
                "raises NotImplementedError with that citation",
    },
    "PV": {},
    "SPV": {},
    "SQPV": {},
    "Wavetable": {},
    "Graph": {},
    "Function": {
        "get_execution_policy": "ExecutionPolicy eliminated by design "
                                "(SURVEY §7: XLA owns scheduling; "
                                "docs/PARITY.md row 2)",
    },
}

# declared in the reference headers but commented out upstream (dormant);
# absence is reported as a warning, presence counts as beyond-parity
DORMANT: Dict[str, Set[str]] = {
    "Audio": {"stereo_delay", "filter_pinna", "synthesize_pulsars"},
    "PV": {"perturb"},
}

# C++ name -> flan_tpu name, where the rename is deliberate
RENAMES: Dict[str, Dict[str, str]] = {
    "Audio": {
        "convert_to_graph": "convert_to_graph",
    },
    "PV": {},
    "SPV": {},
    "SQPV": {
        # camelCase reference accessors exposed snake_case
        "getMP": "mag",  # SoA planes replace the MP struct accessor
        "getBinsPerOctave": "bins_per_octave",
        "getQ": "q",
        "getPeriod": "get_period",
        "getBinFrequency": "bin_frequencies",
        "getFrequencyBandwidth": "bandwidth",
        "getPitchBandwidth": "pitch_bandwidth",
        "frequencyToPitch": "frequency_to_pitch",
        "pitchToFrequency": "pitch_to_frequency",
        "binToPitch": "bin_to_pitch",
        "pitchToBin": "pitch_to_bin",
    },
    "Wavetable": {},
}

_DECL = re.compile(
    r"^\s*(?:[A-Za-z_][\w:<>,\s&\*\.]*[\s&\*])?([A-Za-z_]\w*)\s*\(")


def parse_header_methods(path: str, class_name: str) -> Set[str]:
    """Extract plausible method names from a (possibly commented) header."""
    names: Set[str] = set()
    in_class = False
    depth = 0
    with open(path, "r", errors="replace") as f:
        for raw in f:
            line = raw.strip()
            # the SQPV headers are entirely commented out upstream; strip
            # the comment prefix so the dormant API is still audited
            line = re.sub(r"^//\s?", "", line)
            if re.match(rf"(?:class|struct)\s+{class_name}\b", line):
                in_class = True
                depth = 0
            if not in_class:
                continue
            depth_at_start = depth
            depth += line.count("{") - line.count("}")
            if depth < 0:
                break
            # only class-body-level lines are declarations; deeper lines
            # are inline method bodies (locals would false-positive)
            if depth_at_start != 1:
                continue
            m = _DECL.match(line)
            if not m:
                continue
            name = m.group(1)
            if name in _STOPWORDS or name == class_name:
                continue
            if name.startswith("~") or name[0].isupper():
                continue
            names.add(name)
    return names


def flan_class(name: str):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    jax.config.update("jax_platforms", "cpu")
    import flan_tpu
    return {
        "Audio": flan_tpu.Audio,
        "PV": flan_tpu.PV,
        "SPV": flan_tpu.SPV,
        "SQPV": flan_tpu.SQPV,
        "Wavetable": flan_tpu.Wavetable,
        "Graph": flan_tpu.Graph,
        "Function": flan_tpu.Function,
    }[name]


HEADERS: List[Tuple[str, str]] = [
    ("Audio", "src/flan/Audio/Audio.h"),
    ("PV", "src/flan/PV/PV.h"),
    ("SPV", "src/flan/SPV/SPV.h"),
    ("SQPV", "src/flan/SQPV/SQPV.h"),
    ("Wavetable", "src/flan/Wavetable.h"),
    ("Graph", "src/flan/Graph.h"),
    ("Function", "src/flan/Function.h"),
]

# Function.h's free-function surface (outside the struct): reference name
# -> required attribute path under the flan_tpu package
FREE_FUNCTIONS: List[Tuple[str, str]] = [
    ("ADSR (Function.h:281)", "adsr"),
    ("waveforms::sine (Function.h:294)", "waveforms.sine"),
    ("waveforms::square (Function.h:295)", "waveforms.square"),
    ("waveforms::saw (Function.h:296)", "waveforms.saw"),
    ("waveforms::triangle (Function.h:297)", "waveforms.triangle"),
]


def _free_function_gaps() -> List[str]:
    import flan_tpu
    missing = []
    for ref_name, attr_path in FREE_FUNCTIONS:
        obj = flan_tpu
        try:
            for part in attr_path.split("."):
                obj = getattr(obj, part)
        except AttributeError:
            missing.append(f"{ref_name} -> flan_tpu.{attr_path}")
    return missing


def audit() -> Tuple[Dict[str, List[str]], Dict[str, List[str]]]:
    """Return ({class: [missing live methods]},
               {class: [missing dormant methods]})."""
    gaps: Dict[str, List[str]] = {}
    dormant_gaps: Dict[str, List[str]] = {}
    for cls_name, rel in HEADERS:
        path = os.path.join(REF, rel)
        if not os.path.exists(path):
            continue
        ref_methods = parse_header_methods(path, cls_name)
        cls = flan_class(cls_name)
        have = set(dir(cls))
        missing = []
        dorm = []
        for m in sorted(ref_methods):
            target = RENAMES.get(cls_name, {}).get(m, m)
            if target in have:
                continue
            if m in ALLOW_MISSING.get(cls_name, {}):
                continue
            if m in DORMANT.get(cls_name, set()):
                dorm.append(m)
                continue
            missing.append(m)
        if missing:
            gaps[cls_name] = missing
        if dorm:
            dormant_gaps[cls_name] = dorm
    free = _free_function_gaps()
    if free:
        gaps["<free functions>"] = free
    return gaps, dormant_gaps


def main() -> int:
    gaps, dormant_gaps = audit()
    for cls, dorm in dormant_gaps.items():
        print(f"{cls}: dormant upstream, not yet activated: "
              f"{', '.join(dorm)} (warning only)")
    if not gaps:
        print("parity audit: OK (all live reference header methods covered)")
        return 0
    for cls, missing in gaps.items():
        print(f"{cls}: missing {len(missing)}: {', '.join(missing)}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
