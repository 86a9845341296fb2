#!/bin/bash
# Waits for the tunnel probe's up-flag, gives the probe loop a minute to
# notice it and exit (only one TPU process at a time), then runs the
# measurement refresh. Detached via nohup; progress in
# benchmarks/refresh.log, completion marker below.
cd "$(dirname "$0")/.."
rm -f benchmarks/auto_refresh.done
for i in $(seq 1 600); do
  if [ -f benchmarks/tunnel_up.flag ]; then
    sleep 60
    bash benchmarks/refresh.sh
    echo "rc=$? $(date -u +%H:%M:%S)" > benchmarks/auto_refresh.done
    exit 0
  fi
  sleep 60
done
echo "expired" > benchmarks/auto_refresh.done
