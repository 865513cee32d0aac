#!/bin/bash
# r3 queue 24: adoption decision for --xla_msa_max_outstanding_evictions=0
# (on top of the adopted pf0). Single runs sit ~2.5% above the pf0 band on
# pose (727.5 vs 707-710) — per-process variance is ~5%, so interleave 3
# repeats of each arm. Chains after queue23.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"
while ! grep -q "queue23 done" "$LOG/queue23.log" 2>/dev/null; do sleep 60; done
echo "=== queue24 start $(date -u +%H:%M:%S)"
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}
P="python scripts/probe_msa_flags.py"
for r in 1 2 3; do
  run msa_rep${r}_pf0_pose 1800 $P pose
  run msa_rep${r}_ev0_pose 1800 env LIBTPU_INIT_ARGS=--xla_msa_max_outstanding_evictions=0 $P pose
done
echo "=== queue24 done $(date -u +%H:%M:%S)"
