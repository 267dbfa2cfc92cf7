#!/usr/bin/env bash
# Remainder of the round-3 fleet (run_protocol_r3.sh) after the tunnel
# wedge at flagship-s1 epoch ~42: the first two runs (flagship s0,
# fixed-q s0) completed and are archived; this script runs the rest.
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

run --config conf/config.yaml --fixed-q        --seed 1 --comments r3-fixedq-s1     "${COMMON[@]}"
# flagship-s1 wedged at epoch ~42 with checkpoints intact: resume it
FS1=$(ls -d "$ROOT"/*r3-flagship-s1* 2>/dev/null | head -1)
if [ -n "$FS1" ] && [ ! -f "$FS1/evaluate_biear_metrics_test2.json" ]; then
  run --config conf/config.yaml                --seed 1 --comments r3-flagship-s1   --resume "$FS1" "${COMMON[@]}"
fi
run --config conf/config_single_ctrl.yaml      --seed 0 --comments r3-singlectrl    "${COMMON[@]}"
run --config conf/config_auralnet_deepear.yaml --seed 0 --comments r3-auralnet      "${COMMON[@]}"
run --config conf/config.yaml --scene auditorium --seed 0 --comments r3-auditorium  "${COMMON[@]}"
run --config conf/config_spirit.yaml --scene spirit --seed 0 --comments r3-spirit   "${COMMON[@]}"
# fixedq-s0 re-run: the original ran before fixed_forward honored
# FB_W_DTYPE (f32-HIGHEST frontend); re-run under the bf16-W policy so
# both fixed-Q seeds share numerics with the adaptive arms.
run --config conf/config.yaml --fixed-q        --seed 0 --comments r3-fixedq-rerun  "${COMMON[@]}"
echo "=== $(date -u +%H:%M:%S) FLEET-B DONE" >> "$LOG"
