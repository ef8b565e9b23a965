#!/bin/sh
# Build the single-threaded reference CPU baseline harness
# (bench_cpu_reference.cpp) out-of-tree, with the same shadow-header
# patches as build_algo.sh (MSVC-isms; every FLAN execution policy forced
# to std::execution::seq — "single-thread Flan CPU" is the target's own
# wording, and libstdc++ PSTL over the reference's minimal iota_iter is UB
# anyway, see build_algo.sh).
set -e
REF=${REF:-/root/reference}
HERE=$(cd "$(dirname "$0")" && pwd)
BUILD=${TMPDIR:-/tmp}/flan_reference_oracle_algo
mkdir -p "$BUILD" "$BUILD/flan/Audio" "$BUILD/flan/PV" "$BUILD/flan/Utility"
sed 's/std::string \([a-z_]*\) = "";/std::string \1;/' \
    "$REF/src/flan/Audio/AudioBuffer.h" > "$BUILD/flan/Audio/AudioBuffer.h"
sed 's/std::_Pi/3.14159265358979323846f/' \
    "$REF/src/flan/PV/PV.h" > "$BUILD/flan/PV/PV.h"
sed -e 's/\[\]( FramePair & a, FramePair & b )/[]( const FramePair \& a, const FramePair \& b )/' \
    -e 's/\[\]( BinMag & a, BinMag & b )/[]( const BinMag \& a, const BinMag \& b )/' \
    "$REF/src/flan/PV/PV.cpp" > "$BUILD/PV_patched.cpp"
sed -e 's/std::execution::par_unseq/std::execution::seq/g' \
    -e 's/std::execution::par/std::execution::seq/g' \
    -e 's/std::execution::unseq/std::execution::seq/g' \
    "$REF/src/flan/Utility/execution.h" > "$BUILD/flan/Utility/execution.h"
cp "$REF/src/flan/Utility/iota_iter.h" "$BUILD/flan/Utility/iota_iter.h"

g++ -std=c++20 -O2 -I "$BUILD" -I "$REF/src" -I "$HERE/stubs" \
    "$HERE/bench_cpu_reference.cpp" \
    "$HERE/fft_helper_impl.cpp" \
    "$REF/src/flan/PV/PVModify.cpp" \
    "$BUILD/PV_patched.cpp" \
    "$REF/src/flan/PV/PVBuffer.cpp" \
    "$REF/src/flan/PV/PVInformation.cpp" \
    "$REF/src/flan/PV/PrismFunc.cpp" \
    "$REF/src/flan/Conversions/AudioSPV.cpp" \
    "$REF/src/flan/Conversions/AudioPV.cpp" \
    "$REF/src/flan/Audio/AudioBuffer.cpp" \
    "$REF/src/flan/Audio/AudioChannels.cpp" \
    "$REF/src/flan/Audio/AudioConstructors.cpp" \
    "$REF/src/flan/Audio/AudioConversions.cpp" \
    "$REF/src/flan/Audio/AudioCombination.cpp" \
    "$REF/src/flan/Audio/AudioVolume.cpp" \
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
    "$REF/src/flan/Utility/Color.cpp" \
    "$REF/src/flan/Utility/Interval.cpp" \
    "$REF/src/flan/Utility/Rect.cpp" \
    "$REF/src/flan/Utility/View.cpp" \
    "$REF/src/flan/Utility/Interpolator.cpp" \
    "$REF/src/flan/Utility/buffer_access.cpp" \
    "$REF/src/flan/Utility/execution.cpp" \
    -ltbb -o "$BUILD/bench_cpu_reference"
echo "$BUILD/bench_cpu_reference"
