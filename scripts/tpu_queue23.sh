#!/bin/bash
# r3 queue 23: re-bench single-chip multistream in the deployment output
# form (uint8 argmax maps, stats dropped on BOTH paths): the pf0-era
# regen measured batched_vs_sequential 0.586 because the runner stacked
# raw bf16 logits (16x lane-padded writes) and per-frame stat trails the
# sequential baseline never produced. Chains after queue22.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"
while ! grep -q "queue22 done" "$LOG/queue22.log" 2>/dev/null; do sleep 60; done
echo "=== queue23 start $(date -u +%H:%M:%S)"
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}
run multistream_u8 2400 python scripts/bench_multistream.py
echo "=== queue23 done $(date -u +%H:%M:%S)"
