#!/usr/bin/env bash
# Probe the axon TPU tunnel until a tiny execute+device_get round-trip
# succeeds, then launch a protocol fleet table. Safe to re-run; probes
# are read-only.
# Usage: tools/wait_tpu_then_fleet.sh <fleet.tsv> [runs_root]
set -u
cd "$(dirname "$0")/.."
FLEET=${1:?usage: wait_tpu_then_fleet.sh fleet.tsv [runs_root]}
ROOT=${2:-runs_protocol_r3}
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
    echo "$(date -u +%H:%M:%S) tunnel healthy -> launching fleet" >> "$LOG"
    bash tools/run_protocol.sh "$FLEET" "$ROOT" >> "$LOG" 2>&1
    echo "$(date -u +%H:%M:%S) fleet finished" >> "$LOG"
    exit 0
  fi
  echo "$(date -u +%H:%M:%S) probe failed; retry in 120s" >> "$LOG"
  sleep 120
done
