#!/bin/bash
# r3 queue 10: validate the v2 fused flat4 detect kernel (early-out bands,
# roll-tree group max, single end MXU dot) on-chip, then the forward_hint
# policy searches on the deep nets. Order: smoke FIRST (Mosaic compile of
# the restructured kernel), then the headline bench A/B vs the committed
# 1404 fps, then a trace to attribute the detect time, then policy.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}

run smoke_v2     2400 env CBINFER_TPU_TESTS=1 python -m pytest tests/test_tpu_perf.py -x -q
run bench_v2     1800 python bench.py
run trace_v2     1800 python scripts/profile_trace.py scene
run policy_pose  5400 python scripts/optimize_policy.py pose
run policy_pg    5400 python scripts/optimize_policy.py pose_graph
run policy_seg   5400 python scripts/optimize_policy.py seg
echo "=== queue10 done $(date -u +%H:%M:%S)"
