#!/bin/bash
# Poll the axon TPU tunnel until it answers, then stop. Writes one line
# per attempt to benchmarks/tunnel_probe.log; on success the python
# process itself writes benchmarks/tunnel_up.flag (a pipe's exit status
# would report tail's rc, not timeout's). Each attempt is its own
# process under timeout (the hang is in-process and unrecoverable).
cd "$(dirname "$0")/.."
log=benchmarks/tunnel_probe.log
rm -f benchmarks/tunnel_up.flag
: > "$log"
for i in $(seq 1 200); do
  timeout 300 python - <<'EOF' >> "$log" 2>/dev/null
import jax
b = jax.default_backend()
n = len(jax.devices())
print(f"backend={b} ndev={n}", flush=True)
if b == "tpu":
    open("benchmarks/tunnel_up.flag", "w").write(f"{b} {n}\n")
EOF
  echo "$(date -u +%H:%M:%S) attempt=$i rc=$?" >> "$log"
  if [ -f benchmarks/tunnel_up.flag ]; then
    echo "$(date -u +%H:%M:%S) TUNNEL UP" >> "$log"
    exit 0
  fi
  sleep 180
done
exit 1
