#!/bin/bash
# Build the golden-vector harness against the read-only reference tree and
# regenerate tests/golden fixtures.
set -e
REF=${REF:-/root/reference}
REPO=$(cd "$(dirname "$0")/.." && pwd)
BUILD=${BUILD:-/tmp/refgold-build}
mkdir -p "$BUILD"

g++ -O2 -std=c++17 -w -DPACKAGE_NAME='"refgold"' -DVERSION='"golden"' \
    -DFIXED_POINT=16 \
    -I"$REPO/tools/shim" -I"$REF/src" -I"$REF/lib" -I"$REF" -I"$REF/kiss" \
    "$REPO/tools/golden_harness.cpp" \
    "$REPO/tools/golden_stubs.cpp" \
    "$REF/src/OfdmGenerator.cpp" \
    "$REF/src/PAPRStats.cpp" \
    "$REF/kiss/kiss_fft.c" \
    "$REF/src/PrbsGenerator.cpp" \
    "$REF/src/ConvEncoder.cpp" \
    "$REF/src/PuncturingEncoder.cpp" \
    "$REF/src/PuncturingRule.cpp" \
    "$REF/src/TimeInterleaver.cpp" \
    "$REF/src/QpskSymbolMapper.cpp" \
    "$REF/src/FrequencyInterleaver.cpp" \
    "$REF/src/PhaseReference.cpp" \
    "$REF/src/DifferentialModulator.cpp" \
    "$REF/src/GuardIntervalInserter.cpp" \
    "$REF/src/TII.cpp" \
    "$REF/src/SubchannelSource.cpp" \
    "$REF/src/FicSource.cpp" \
    "$REF/src/Buffer.cpp" \
    "$REF/src/ModPlugin.cpp" \
    "$REF/src/FrameMultiplexer.cpp" \
    "$REF/src/BlockPartitioner.cpp" \
    -o "$BUILD/refgold"

mkdir -p "$REPO/tests/golden"
"$BUILD/refgold" "$REPO/tests/golden"
ls -la "$REPO/tests/golden" | head -5
