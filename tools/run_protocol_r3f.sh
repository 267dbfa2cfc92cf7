#!/usr/bin/env bash
# Round-3 fleet F: the reverberant-scene ablation. Rounds so far ran the
# adaptive-vs-fixed-Q comparison only on the anechoic task; Auditorium3
# (BRIR synthesis + speech corpus + diffuse noise) currently has a
# flagship run only. This fleet adds the fixed-Q arm (two seeds) so the
# paper's central ablation is also resolved under reverberation.
# Reference protocol shape: 72k x 150 epochs, bs 64, unseen-pool test2
# (/root/reference/conf/config.yaml:7-8). Same resilient pattern as
# run_protocol_r3c.sh (tunnel probe + resume + archive).
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

SEED=0 run_target auditorium-fixedq    r3-aud-fixedq    --config conf/config.yaml --scene auditorium --fixed-q
SEED=1 run_target auditorium-fixedq-s1 r3-aud-fixedq-s1 --config conf/config.yaml --scene auditorium --fixed-q
SEED=1 run_target auditorium-s1        r3-auditorium-s1 --config conf/config.yaml --scene auditorium
say "FLEET-F DONE"
