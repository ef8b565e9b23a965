#!/bin/sh
# Compile the reference's ALGORITHM layer out-of-tree (PVModify.cpp, PV.cpp,
# AudioSPV.cpp + their support TUs) and regenerate the committed algorithm
# goldens in tests/fixtures/reference/. FFTW is replaced by
# fft_helper_impl.cpp (same interface); libsndfile by stubs/sndfile.h
# (declarations only, never called). The reference tree is never modified
# and never copied into this repo.
set -e
REF=${REF:-/root/reference}
HERE=$(cd "$(dirname "$0")" && pwd)
OUT=${1:-$HERE/../../tests/fixtures/reference}
BUILD=${TMPDIR:-/tmp}/flan_reference_oracle_algo
mkdir -p "$BUILD" "$OUT"
# GCC (unlike the reference's MSVC) rejects a default member initializer
# used by a same-class default argument (AudioBuffer.h:123 SndfileStrings).
# Build-time shadow header in $BUILD (never committed): drop the ' = ""'
# DMIs — std::string default-constructs to "" so semantics are identical.
mkdir -p "$BUILD/flan/Audio" "$BUILD/flan/PV"
sed 's/std::string \([a-z_]*\) = "";/std::string \1;/' \
    "$REF/src/flan/Audio/AudioBuffer.h" > "$BUILD/flan/Audio/AudioBuffer.h"
# More MSVC-isms GCC rejects, patched the same build-time-shadow way with
# identical semantics: std::_Pi (MSVC internal) -> 3.14159265358979323846f,
# and sort/unique comparator lambdas taking non-const refs -> const refs.
sed 's/std::_Pi/3.14159265358979323846f/' \
    "$REF/src/flan/PV/PV.h" > "$BUILD/flan/PV/PV.h"
# AudioFilter.cpp uses MSVC's std::_Pi in the Hilbert pole design
# (AudioFilter.cpp:1109-1140); same build-time-shadow substitution
# (double precision there).
sed 's/std::_Pi/3.14159265358979323846/g' \
    "$REF/src/flan/Audio/AudioFilter.cpp" > "$BUILD/AudioFilter_patched.cpp"
sed -e 's/\[\]( FramePair & a, FramePair & b )/[]( const FramePair \& a, const FramePair \& b )/' \
    -e 's/\[\]( BinMag & a, BinMag & b )/[]( const BinMag \& a, const BinMag \& b )/' \
    "$REF/src/flan/PV/PV.cpp" > "$BUILD/PV_patched.cpp"
# Force every FLAN parallel policy to std::execution::seq in a shadow
# execution.h: libstdc++'s PSTL + the reference's minimal iota_iter is UB
# (operator[] ignores the iterator base; measured par_unseq executes only
# x in {0,1} of a 24-range). The sequential path computes the
# author-intended semantics, which is what the oracle must capture.
mkdir -p "$BUILD/flan/Utility"
sed -e 's/std::execution::par_unseq/std::execution::seq/g' \
    -e 's/std::execution::par/std::execution::seq/g' \
    -e 's/std::execution::unseq/std::execution::seq/g' \
    "$REF/src/flan/Utility/execution.h" > "$BUILD/flan/Utility/execution.h"
cp "$REF/src/flan/Utility/iota_iter.h" "$BUILD/flan/Utility/iota_iter.h"
# GCC rejects vec2Base's converting-constructor + conversion-operator pair
# as ambiguous (MSVC picks the ctor). Shadow-drop the operator: the
# converting constructor alone yields identical values.
sed '/Convert to other T/,+3d' \
    "$REF/src/flan/Utility/vec2.h" > "$BUILD/flan/Utility/vec2.h"
# Color::from_hsv calls unqualified abs() on a double expression
# (Color.cpp:10): MSVC (the author's platform) resolves ::abs(double),
# gcc resolves the C int abs — which truncates the fractional sector
# position to 0 and collapses every hue to a 2-level color. Shadow-patch
# to std::fabs: the author-intended float semantics, same policy as the
# PSTL seq patch above.
sed 's/abs(fmod/std::fabs(fmod/' \
    "$REF/src/flan/Utility/Color.cpp" > "$BUILD/Color_patched.cpp"





g++ -std=c++20 -O2 -I "$BUILD" -I "$REF/src" -I "$HERE/stubs" \
    "$HERE/gen_algo_fixtures.cpp" \
    "$HERE/fft_helper_impl.cpp" \
    "$REF/src/flan/PV/PVModify.cpp" \
    "$BUILD/PV_patched.cpp" \
    "$REF/src/flan/PV/PVBuffer.cpp" \
    "$REF/src/flan/PV/PVInformation.cpp" \
    "$REF/src/flan/PV/PrismFunc.cpp" \
    "$REF/src/flan/Conversions/AudioSPV.cpp" \
    "$REF/src/flan/Conversions/AudioPV.cpp" \
    "$REF/src/flan/Conversions/AudioGraph.cpp" \
    "$REF/src/flan/Conversions/PVGraph.cpp" \
    "$REF/src/flan/Audio/AudioBuffer.cpp" \
    "$REF/src/flan/Audio/AudioChannels.cpp" \
    "$REF/src/flan/Audio/AudioConstructors.cpp" \
    "$REF/src/flan/Audio/AudioConversions.cpp" \
    "$REF/src/flan/Audio/AudioCombination.cpp" \
    "$REF/src/flan/Audio/AudioVolume.cpp" \
    "$BUILD/AudioFilter_patched.cpp" \
    "$REF/src/flan/Audio/AudioTemporal.cpp" \
    "$REF/src/flan/Audio/AudioSpatial.cpp" \
    "$REF/src/flan/Audio/AudioSynthesis.cpp" \
    "$REF/src/flan/Audio/AudioInformation.cpp" \
    "$REF/src/flan/Wavetable.cpp" \
    "$REF/src/WDL/resample.cpp" \
    "$REF/src/flan/Audio/AudioMod.cpp" \
    "$REF/src/r8brain/r8bbase.cpp" \
    "$REF/src/flan/SPV/SPV.cpp" \
    "$REF/src/flan/SPV/SPVBuffer.cpp" \
    "$REF/src/flan/Function.cpp" \
    "$REF/src/flan/Graph.cpp" \
    "$REF/src/flan/DSPUtility.cpp" \
    "$REF/src/flan/WindowFunctions.cpp" \
    "$REF/src/flan/phase_vocoder.cpp" \
    "$REF/src/flan/defines.cpp" \
    "$REF/src/flan/Utility/Bytes.cpp" \
    "$BUILD/Color_patched.cpp" \
    "$REF/src/flan/Utility/Interval.cpp" \
    "$REF/src/flan/Utility/Rect.cpp" \
    "$REF/src/flan/Utility/View.cpp" \
    "$REF/src/flan/Utility/Interpolator.cpp" \
    "$REF/src/flan/Utility/buffer_access.cpp" \
    "$REF/src/flan/Utility/execution.cpp" \
    -ltbb -o "$BUILD/gen_algo_fixtures"
"$BUILD/gen_algo_fixtures" "$OUT"
ls "$OUT" | grep -c algo
