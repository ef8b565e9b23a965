#!/bin/sh
# Compile the reference's self-contained units out-of-tree and regenerate
# the committed golden fixtures in tests/fixtures/reference/.
# The reference tree is never modified and never copied into this repo.
set -e
REF=${REF:-/root/reference}
HERE=$(cd "$(dirname "$0")" && pwd)
OUT=${1:-$HERE/../../tests/fixtures/reference}
BUILD=${TMPDIR:-/tmp}/flan_reference_oracle
mkdir -p "$BUILD" "$OUT"
g++ -std=c++20 -O2 -I "$REF/src" \
    "$HERE/gen_fixtures.cpp" \
    "$REF/src/flan/phase_vocoder.cpp" \
    "$REF/src/flan/WindowFunctions.cpp" \
    "$REF/src/flan/PV/PVBuffer.cpp" \
    "$REF/src/flan/Utility/Bytes.cpp" \
    "$REF/src/flan/Utility/Color.cpp" \
    "$REF/src/flan/Utility/Interval.cpp" \
    "$REF/src/flan/Utility/Rect.cpp" \
    "$REF/src/flan/defines.cpp" \
    "$REF/src/flan/DSPUtility.cpp" \
    -ltbb -o "$BUILD/gen_fixtures"
"$BUILD/gen_fixtures" "$OUT"
ls -la "$OUT"
