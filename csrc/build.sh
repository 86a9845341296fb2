#!/bin/bash
# Build the native host library into the package directory.
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
g++ -O2 -shared -fPIC -std=c++17 \
  "$HERE/hexl_tpu_host.cpp" -o "$HERE/../hexl_tpu/_hexl_tpu_host.so"
echo "built hexl_tpu/_hexl_tpu_host.so"
