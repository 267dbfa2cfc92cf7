#!/usr/bin/env bash
# Resilient round-3 fleet driver: runs every protocol config that does
# not yet have archived test2 metrics, probing tunnel health between
# runs (the axon tunnel wedges spontaneously — see docs/protocol_r3/
# README.md) and resuming from checkpoints instead of restarting.
#
# Success criterion per target: docs/protocol_r3/<label>/
# evaluate_biear_metrics_test2.json exists (archived on completion).
set -u
cd "$(dirname "$0")/.."
ROOT=${1:-runs_protocol_r3}
LOG=${ROOT}/fleet.log
DEST=docs/protocol_r3
mkdir -p "$ROOT" "$DEST"
POOL=2000
SNR="5,25"
COMMON=(--corpus speech --pool-size $POOL --noise-snr "$SNR"
        --fb-w-dtype bfloat16 --runs-root "$ROOT")

say() { echo "=== $(date -u +%H:%M:%S) $*" >> "$LOG"; }

wait_tunnel() {
  while true; do
    if timeout 240 python -c "
import jax, jax.numpy as jnp
d = jax.devices(); assert d
x = jax.device_put(jnp.ones((8, 8)))
assert float(jax.device_get(jnp.sum(x * 3.0))) == 192.0
" >> "$LOG" 2>&1; then return 0; fi
    say "tunnel down; re-probe in 120s"
    sleep 120
  done
}

# find_run SUFFIX -> newest run dir whose name ends with _SUFFIX
find_run() {
  local hit=""
  for d in "$ROOT"/*_"$1"; do
    [ -d "$d" ] && hit="$d"
  done
  echo "$hit"
}

# run_target LABEL COMMENTS [extra args...]
run_target() {
  local label=$1 comments=$2; shift 2
  if [ -f "$DEST/$label/evaluate_biear_metrics_test2.json" ]; then
    say "SKIP $label (already archived)"
    return 0
  fi
  local attempt
  for attempt in 1 2 3 4; do
    wait_tunnel
    local rd; rd=$(find_run "$comments")
    local args=("$@" --seed "${SEED:-0}" --comments "$comments" "${COMMON[@]}")
    if [ -n "$rd" ] && [ -d "$rd/checkpoints/last" ]; then
      args+=(--resume "$rd")
    fi
    say "START $label attempt $attempt: ${args[*]}"
    timeout 5400 python tools/run_full_protocol.py "${args[@]}" >> "$LOG" 2>&1
    say "EXIT $? $label attempt $attempt"
    rd=$(find_run "$comments")
    if [ -n "$rd" ] && [ -f "$rd/evaluate_biear_metrics_test2.json" ]; then
      python tools/archive_protocol_run.py "$rd" "$label" --dest "$DEST" >> "$LOG" 2>&1
      say "DONE $label -> $DEST/$label"
      return 0
    fi
  done
  say "GIVE-UP $label after 4 attempts"
  return 1
}

SEED=1 run_target fixedq-s1    r3-fixedq-s1    --config conf/config.yaml --fixed-q
SEED=1 run_target flagship-s1  r3-flagship-s1  --config conf/config.yaml
SEED=0 run_target singlectrl   r3-singlectrl   --config conf/config_single_ctrl.yaml
SEED=0 run_target auralnet     r3-auralnet     --config conf/config_auralnet_deepear.yaml
SEED=0 run_target auditorium   r3-auditorium   --config conf/config.yaml --scene auditorium
SEED=0 run_target spirit       r3-spirit       --config conf/config_spirit.yaml --scene spirit
# fixedq-s0 re-run under the unified bf16-W policy (the archived
# fixedq-s0 predates fixed_forward honoring FB_W_DTYPE).
SEED=0 run_target fixedq-s0b   r3-fixedq-rerun --config conf/config.yaml --fixed-q
say "FLEET-C DONE"
