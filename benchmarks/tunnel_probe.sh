#!/bin/bash
# Poll the axon TPU tunnel until it answers, then stop. Writes one line
# per attempt to benchmarks/tunnel_probe.log; on success the python
# process itself writes benchmarks/tunnel_up.flag. Each attempt is its
# own process under timeout (the hang is in-process and unrecoverable).
# Success = a non-cpu device answers a real dispatch (an integer sum),
# not just plugin init — and NOT a backend-name string match (the
# platform registers as 'axon', not 'tpu').
cd "$(dirname "$0")/.."
log=benchmarks/tunnel_probe.log
rm -f benchmarks/tunnel_up.flag
: > "$log"
for i in $(seq 1 200); do
  timeout 300 python - <<'EOF' >> "$log" 2>&1
import jax, jax.numpy as jnp
b = jax.default_backend()
d = jax.devices()
s = int(jnp.arange(8, dtype=jnp.uint32).sum())
print(f"backend={b} ndev={len(d)} kind={d[0].device_kind} sum={s}", flush=True)
if b != "cpu" and s == 28:
    open("benchmarks/tunnel_up.flag", "w").write(f"{b} {len(d)}\n")
EOF
  echo "$(date -u +%H:%M:%S) attempt=$i rc=$?" >> "$log"
  if [ -f benchmarks/tunnel_up.flag ]; then
    echo "$(date -u +%H:%M:%S) TUNNEL UP" >> "$log"
    exit 0
  fi
  sleep 180
done
exit 1
