#!/bin/bash
# r3 queue 25 (post-reboot recovery): the reboot before the final session
# wiped .queue_logs, losing queue22 (fused-detect A/B re-measurement after
# the wiring fix made the first A/B vacuous), queue23 (multistream re-run
# at the uint8-argmax output form), and queue24 (ev0 adoption repeats).
# Re-run them in priority order. Assumes the chip is free when launched.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"
echo "=== queue25 start $(date -u +%H:%M:%S)"
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}
# 1. multistream row: the committed 0.586x row predates the 3cff601 fix
run multistream_u8 2400 python scripts/bench_multistream.py
# 2. fused-detect A/B with the wiring LIVE (queue22 replacement)
run fused_ab_pose 2400 python scripts/exp_fused_ab.py pose 5
run fused_ab_seg  2400 python scripts/exp_fused_ab.py seg 5
# 3. ev0 adoption repeats (queue24 replacement; interleaved arms)
P="python scripts/probe_msa_flags.py"
for r in 1 2 3; do
  run msa_rep${r}_pf0_pose 1800 $P pose
  run msa_rep${r}_ev0_pose 1800 env LIBTPU_INIT_ARGS="--xla_msa_max_outstanding_prefetches=0 --xla_msa_max_outstanding_evictions=0" $P pose
done
echo "=== queue25 done $(date -u +%H:%M:%S)"
