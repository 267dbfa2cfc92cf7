#!/usr/bin/env bash
# Parameterized protocol fleet driver — replaces the ten near-identical
# run_protocol_r3{,b..i}.sh / run_protocol_r4.sh scripts (their archived
# artifacts under docs/protocol_r3/ are unchanged; this driver reproduces
# any of those fleets from a table).
#
# Usage:
#   tools/run_protocol.sh [--dry-run] <fleet.tsv> [runs_root]
#
# fleet.tsv: one arm per line, '#' comments allowed:
#   <label> <seed> <comments-slug> <extra run_full_protocol.py args...>
# e.g.
#   flagship-s1  1  r3-flagship-s1  --config conf/config.yaml
#   spirit-fixedq 0 r3-spirit-fixedq --config conf/config_spirit.yaml --scene spirit --fixed-q
#
# Environment overrides: DEST (archive dir, default docs/protocol_r3),
# POOL (corpus pool size, 2000), SNR (noise SNR range, "5,25"),
# ATTEMPTS (6), RUN_TIMEOUT (5400 s per attempt).
#
# Carries the round-3/4 advisor fixes ONCE, for every fleet:
#   * resume guard tests the actual resumable artifact (checkpoints/last,
#     first written after epoch 1), not the eagerly-created checkpoints/
#     dir, so a run that dies mid-epoch-1 retries from scratch instead of
#     GIVE-UPing on a bad --resume;
#   * ATTEMPTS (default 6) tries per arm — resume makes retries cheap;
#   * arms whose archived test2 metrics already exist are skipped.
set -u
cd "$(dirname "$0")/.."

DRY=0
if [ "${1:-}" = "--dry-run" ]; then DRY=1; shift; fi
FLEET=${1:?usage: run_protocol.sh [--dry-run] fleet.tsv [runs_root]}
ROOT=${2:-runs_protocol_r3}
LOG=${ROOT}/fleet.log
DEST=${DEST:-docs/protocol_r3}
POOL=${POOL:-2000}
SNR=${SNR:-5,25}
ATTEMPTS=${ATTEMPTS:-6}
RUN_TIMEOUT=${RUN_TIMEOUT:-5400}
COMMON=(--corpus speech --pool-size "$POOL" --noise-snr "$SNR"
        --runs-root "$ROOT")

[ "$DRY" = 1 ] || mkdir -p "$ROOT" "$DEST"

say() {
  if [ "$DRY" = 1 ]; then echo "$*"; else
    echo "=== $(date -u +%H:%M:%S) $*" >> "$LOG"
  fi
}

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
  local label=$1 seed=$2 comments=$3; shift 3
  if [ "$DRY" = 1 ]; then
    say "PLAN $label: seed=$seed comments=$comments args: $* ${COMMON[*]}"
    return 0
  fi
  if [ -f "$DEST/$label/evaluate_biear_metrics_test2.json" ]; then
    say "SKIP $label (already archived)"
    return 0
  fi
  local attempt
  for attempt in $(seq 1 "$ATTEMPTS"); do
    wait_tunnel
    local rd; rd=$(find_run "$comments")
    local args=("$@" --seed "$seed" --comments "$comments" "${COMMON[@]}")
    if [ -n "$rd" ] && [ -d "$rd/checkpoints/last" ]; then
      args+=(--resume "$rd")
    fi
    say "START $label attempt $attempt: ${args[*]}"
    timeout "$RUN_TIMEOUT" python tools/run_full_protocol.py "${args[@]}" >> "$LOG" 2>&1
    say "EXIT $? $label attempt $attempt"
    rd=$(find_run "$comments")
    if [ -n "$rd" ] && [ -f "$rd/evaluate_biear_metrics_test2.json" ]; then
      python tools/archive_protocol_run.py "$rd" "$label" --dest "$DEST" >> "$LOG" 2>&1
      say "DONE $label -> $DEST/$label"
      return 0
    fi
  done
  say "GIVE-UP $label after $ATTEMPTS attempts"
  return 1
}

rc=0
while IFS= read -r line || [ -n "$line" ]; do
  case "$line" in ''|\#*) continue ;; esac
  # shellcheck disable=SC2086
  set -- $line
  run_target "$@" || rc=1
done < "$FLEET"
say "FLEET DONE (rc=$rc)"
exit $rc
