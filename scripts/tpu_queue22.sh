#!/bin/bash
# r3 queue 22: REAL fused-consumer-detect A/B. The first A/B (and the
# first EXP_fused_ab.json) compared two identical programs — review r3
# found cb_conv_apply dropped fused_fn on the floor, so every "fused"
# variant compiled unfused and 0.993x/0.997x was noise between identical
# binaries. With the wiring fixed (and verified non-vacuous by the
# on-chip parity check in queue21), re-measure and re-decide.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"
while ! grep -q "queue21 done" "$LOG/queue21.log" 2>/dev/null; do sleep 60; done
echo "=== queue22 start $(date -u +%H:%M:%S)"
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}
run fused_ab_pose  2400 python scripts/exp_fused_ab.py pose 5
run fused_ab_seg   2400 python scripts/exp_fused_ab.py seg 5
run fused_ab_scene 2400 python scripts/exp_fused_ab.py scene 5
echo "=== queue22 done $(date -u +%H:%M:%S)"
