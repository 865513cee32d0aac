#!/bin/bash
# r3 queue 21: on-chip bit-parity of the compiled fused consumer-detect
# path (interpret-mode suites prove semantics; this proves Mosaic).
# Chains after queue20.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"
while ! grep -q "queue20 done" "$LOG/queue20.log" 2>/dev/null; do sleep 60; done
echo "=== queue21 start $(date -u +%H:%M:%S)"
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}
run fused_parity_pose  2400 python scripts/check_fused_parity_tpu.py pose 12
run fused_parity_seg   2400 python scripts/check_fused_parity_tpu.py seg 12
echo "=== queue21 done $(date -u +%H:%M:%S)"
