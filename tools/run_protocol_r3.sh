#!/usr/bin/env bash
# Round-3 full-scale protocol fleet on the NON-SATURATING speech corpus
# (VERDICT round-2, "Next round" item 2): the six reference configs plus a
# second seed for the flagship-vs-fixed-Q ablation axis, 72k x 150 epochs,
# batch 64, source-filter speech pools (2000 segments, disjoint speaker
# sets per pool) + diffuse noise at SNR ~ U[SNR_LO, SNR_HI] dB.
#
# Runs SEQUENTIALLY (one chip; concurrent jobs corrupt each other's
# timing and HBM). Each run appends to $LOG. Usage:
#   bash tools/run_protocol_r3.sh [runs_root]
set -u
cd "$(dirname "$0")/.."
ROOT=${1:-runs_protocol_r3}
LOG=${ROOT}/fleet.log
mkdir -p "$ROOT"
POOL=2000
SNR="5,25"
COMMON=(--corpus speech --pool-size $POOL --noise-snr "$SNR"
        --fb-w-dtype bfloat16 --runs-root "$ROOT")

run() {
  echo "=== $(date -u +%H:%M:%S) START: $*" >> "$LOG"
  timeout 7200 python tools/run_full_protocol.py "$@" >> "$LOG" 2>&1
  echo "=== $(date -u +%H:%M:%S) EXIT $?: $*" >> "$LOG"
}

run --config conf/config.yaml                  --seed 0 --comments r3-flagship      "${COMMON[@]}"
run --config conf/config.yaml --fixed-q        --seed 0 --comments r3-fixedq        "${COMMON[@]}"
run --config conf/config.yaml                  --seed 1 --comments r3-flagship-s1   "${COMMON[@]}"
run --config conf/config.yaml --fixed-q        --seed 1 --comments r3-fixedq-s1     "${COMMON[@]}"
run --config conf/config_single_ctrl.yaml      --seed 0 --comments r3-singlectrl    "${COMMON[@]}"
run --config conf/config_auralnet_deepear.yaml --seed 0 --comments r3-auralnet      "${COMMON[@]}"
run --config conf/config.yaml --scene auditorium --seed 0 --comments r3-auditorium  "${COMMON[@]}"
run --config conf/config_spirit.yaml --scene spirit --seed 0 --comments r3-spirit   "${COMMON[@]}"
echo "=== $(date -u +%H:%M:%S) FLEET DONE" >> "$LOG"
