#!/usr/bin/env bash
# Round-4 fleet J: second seeds for the Spirit scene so the largest
# reported adaptive-vs-fixed gap (99.2% vs 95.7% sound_acc) meets the
# same 2+ seed replication standard as every other arm in the table.
# Carries the round-3 advisor fixes:
#   * resume guard tests the actual resumable artifact
#     (checkpoints/last, written after epoch 1) instead of the
#     eagerly-created checkpoints/ dir, so a run that dies mid-epoch-1
#     retries from scratch rather than GIVE-UPing on a bad --resume;
#   * 6 attempts (resume makes extra attempts cheap);
#   * bench steps skip when their archived JSON already exists.
set -u
cd "$(dirname "$0")/.."
ROOT=${1:-runs_protocol_r3}
LOG=${ROOT}/fleet.log
DEST=docs/protocol_r3
mkdir -p "$ROOT" "$DEST"
POOL=2000
SNR="5,25"
COMMON=(--corpus speech --pool-size $POOL --noise-snr "$SNR"
        --runs-root "$ROOT")

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

find_run() {
  local hit=""
  for d in "$ROOT"/*_"$1"; do
    [ -d "$d" ] && hit="$d"
  done
  echo "$hit"
}

run_target() {
  local label=$1 comments=$2; shift 2
  if [ -f "$DEST/$label/evaluate_biear_metrics_test2.json" ]; then
    say "SKIP $label (already archived)"
    return 0
  fi
  local attempt
  for attempt in 1 2 3 4 5 6; do
    wait_tunnel
    local rd; rd=$(find_run "$comments")
    local args=("$@" --seed "${SEED:-0}" --comments "$comments" "${COMMON[@]}")
    # Resume only when the resumable artifact itself exists: the runner
    # requires checkpoints/last (first written after epoch 1); the bare
    # checkpoints/ dir is created eagerly at run start and proves nothing.
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
  say "GIVE-UP $label after 6 attempts"
  return 1
}

SEED=1 run_target spirit-s1        r4-spirit-s1        --config conf/config_spirit.yaml --scene spirit
SEED=1 run_target spirit-fixedq-s1 r4-spirit-fixedq-s1 --config conf/config_spirit.yaml --scene spirit --fixed-q --fb-w-dtype bfloat16
say "FLEET-J DONE"
