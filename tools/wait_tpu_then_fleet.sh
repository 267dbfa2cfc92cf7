#!/usr/bin/env bash
# Probe the axon TPU tunnel until a tiny execute+device_get round-trip
# succeeds, then launch the remainder of the round-3 protocol fleet
# (tools/run_protocol_r3b.sh). Safe to re-run; probes are read-only.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tunnel_probe.log
echo "$(date -u +%H:%M:%S) watchdog start" >> "$LOG"
while true; do
  if timeout 240 python -c "
import jax, jax.numpy as jnp
d = jax.devices(); assert d
x = jax.device_put(jnp.ones((8, 8)))
assert float(jax.device_get(jnp.sum(x * 3.0))) == 192.0
print('probe ok:', d[0])
" >> "$LOG" 2>&1; then
    echo "$(date -u +%H:%M:%S) tunnel healthy -> launching fleet-b" >> "$LOG"
    bash tools/run_protocol_r3b.sh runs_protocol_r3 >> "$LOG" 2>&1
    echo "$(date -u +%H:%M:%S) fleet-b finished" >> "$LOG"
    exit 0
  fi
  echo "$(date -u +%H:%M:%S) probe failed; retry in 120s" >> "$LOG"
  sleep 120
done
