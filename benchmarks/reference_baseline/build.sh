#!/bin/bash
# Builds the reference (intel/hexl) library + our baseline harness directly
# with g++, using local stubs for the FetchContent'd cpu_features dep and
# the cmake-generated defines.hpp (zero-egress container).
set -euo pipefail

REF=${REF:-/root/reference}
HERE="$(cd "$(dirname "$0")" && pwd)"
OUT=${OUT:-/tmp/hexl_ref_build}
mkdir -p "$OUT"

SRCS=(
  "$REF"/hexl/eltwise/*.cpp
  "$REF"/hexl/ntt/*.cpp
  "$REF"/hexl/number-theory/*.cpp
  "$REF"/hexl/experimental/fft-like/*.cpp
  "$REF"/hexl/experimental/seal/*.cpp
)

# -include unordered_map: ntt-cache.hpp uses std::unordered_map without
# including it (works in the reference's cmake build via transitive PCH).
g++ -O3 -march=native -std=c++17 -DNDEBUG \
  -include unordered_map -include utility \
  -DBASELINE_EXPERIMENTAL -DHEXL_HAS_AVX512DQ=1 -DHEXL_HAS_AVX512IFMA=1 -DHEXL_HAS_AVX512VBMI2=1 \
  -I"$HERE/stub" \
  -I"$REF/hexl/include" \
  -I"$REF/hexl" \
  ${SRCS[@]} \
  "$HERE/bench_reference.cpp" \
  -o "$OUT/bench_reference"

echo "built $OUT/bench_reference"
