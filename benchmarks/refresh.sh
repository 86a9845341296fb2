#!/bin/bash
# One-command TPU measurement refresh (supersedes refresh_round2.sh).
# Run after any toolchain update or kernel-scheme change. Each step is
# its own process (the tunnel degrades after a few hundred distinct
# compiles per process) and under timeout. Only ONE TPU process may run
# at a time — do not run anything else alongside this.
#
# After it finishes:  python benchmarks/gen_doc_tables.py --apply
# regenerates the README/BASELINE tables from tpu_results.json (docs
# are never hand-edited).
set -uo pipefail
cd "$(dirname "$0")/.."
log=benchmarks/refresh.log
: > "$log"

run() {
  echo "=== $* ===" | tee -a "$log"
  timeout "$1" "${@:2}" 2>&1 | tee -a "$log"
  echo "--- rc=$? ---" | tee -a "$log"
}

# 1. Full suite -> benchmarks/tpu_results.json (every committed row).
run 5400 python benchmarks/bench_suite.py --out benchmarks/tpu_results.json

# 2. Standing A/Bs that must be re-measured per toolchain update
#    (CLAUDE.md): xla-vs-pallas NTT backend (incl. the minimal Mosaic
#    butterfly reproducer), eltwise approx quotients, DF FFT radix, and
#    the issue-rate probe behind the MFU figure.
run 1500 python benchmarks/vpu_probe.py
run 1500 python benchmarks/mosaic_butterfly_ab.py
run 1500 python benchmarks/mosaic_df_bfly_ab.py
run 1500 python benchmarks/fft_profile.py
run 2400 python benchmarks/ntt_pack_ab.py
run 580 python bench.py
run 1200 env HEXL_TPU_NTT_BACKEND=pallas python bench.py
run 1200 python benchmarks/eltwise_approx_ab.py
run 1200 env HEXL_TPU_DISABLE_APPROX=1 python benchmarks/eltwise_approx_ab.py
run 1200 env HEXL_TPU_FFT_RADIX=2 python benchmarks/fft_radix_ab.py
run 1200 env HEXL_TPU_FFT_RADIX=4 python benchmarks/fft_radix_ab.py

# 3. Headline config sweep (batch/radix grid around the default).
run 1800 python benchmarks/headline_sweep.py

echo "refresh complete; results in $log"
