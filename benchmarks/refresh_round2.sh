#!/bin/bash
# One-command TPU measurement refresh for round 2 (run when the tunnel is
# up). Each step is its own process (the tunnel degrades after a few
# hundred distinct compiles per process) and under timeout. Only ONE TPU
# process may run at a time — do not run anything else alongside this.
set -uo pipefail
cd "$(dirname "$0")/.."
log=benchmarks/refresh_round2.log
: > "$log"

run() {
  echo "=== $* ===" | tee -a "$log"
  timeout "$1" "${@:2}" 2>&1 | tee -a "$log"
  echo "--- rc=$? ---" | tee -a "$log"
}

# 1. Full suite -> benchmarks/tpu_results.json (refreshes the stale fft
#    rows, measures the new rns/dyadic/key-switch rows).
run 5400 python benchmarks/bench_suite.py --out benchmarks/tpu_results.json

# 2. DF FFT radix A/B on the TPU backend (pending from the tunnel outage).
run 1200 env HEXL_TPU_FFT_RADIX=2 python benchmarks/fft_radix_ab.py
run 1200 env HEXL_TPU_FFT_RADIX=4 python benchmarks/fft_radix_ab.py

# 2b. Eltwise approx-quotient A/B (approx is the TPU default).
run 1200 python benchmarks/eltwise_approx_ab.py
run 1200 env HEXL_TPU_DISABLE_APPROX=1 python benchmarks/eltwise_approx_ab.py

# 3. Headline config sweep, then the headline itself — and the
#    xla-vs-pallas NTT backend A/B (CLAUDE.md: re-A/B per toolchain
#    update; 'xla' is the measured round-2 default).
run 1800 python benchmarks/headline_sweep.py
run 580 python bench.py
run 1200 env HEXL_TPU_NTT_BACKEND=pallas python bench.py

echo "refresh complete; results in $log"
