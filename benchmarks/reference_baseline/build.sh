#!/bin/bash
# Builds the reference (intel/hexl) library + our harnesses directly with
# g++, using local stubs for the FetchContent'd cpu_features dep and the
# cmake-generated defines.hpp (zero-egress container).
#
# Usage: build.sh [bench|crosscheck|all]   (default: all)
set -euo pipefail

REF=${REF:-/root/reference}
HERE="$(cd "$(dirname "$0")" && pwd)"
OUT=${OUT:-/tmp/hexl_ref_build}
TARGET=${1:-all}
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
build() {  # build <main.cpp> <out-name>
  g++ -O3 -march=native -std=c++17 -DNDEBUG \
    -include unordered_map -include utility \
    -DBASELINE_EXPERIMENTAL -DHEXL_HAS_AVX512DQ=1 -DHEXL_HAS_AVX512IFMA=1 -DHEXL_HAS_AVX512VBMI2=1 \
    -I"$HERE/stub" \
    -I"$REF/hexl/include" \
    -I"$REF/hexl" \
    ${SRCS[@]} \
    "$HERE/$1" \
    -o "$OUT/$2"
  echo "built $OUT/$2"
}

case "$TARGET" in
  bench)      build bench_reference.cpp bench_reference ;;
  crosscheck) build crosscheck_reference.cpp crosscheck_reference ;;
  all)        build bench_reference.cpp bench_reference
              build crosscheck_reference.cpp crosscheck_reference ;;
  *) echo "unknown target $TARGET" >&2; exit 2 ;;
esac
