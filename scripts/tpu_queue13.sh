#!/bin/bash
# r3 queue 13 (relaunch after session restart killed queue11/12 before
# they started and queue10 mid-policy_pg):
#   1. bench.py headline A/B of the shipped scan forms (mean stats +
#      clip-resident ingest, commit c647e88) vs the 1521.9 fps committed
#      at stack+per-frame.
#   2. per-stage traces of pose and seg in the shipped form — the rows
#      farthest from speed-of-light; these decide the next kernel target.
#   3. scene trace in the shipped form (PROFILE attribution).
#   4. the two policy searches queue10 never finished (pose_graph, seg).
#   5. full artifact regeneration (eval_headline all, DAG bench).
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"
echo "=== queue13 start $(date -u +%H:%M:%S)"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}

run bench_v3      1800 python bench.py
run trace_pose_mi 2400 env CBINFER_TRACE_STATS=mean CBINFER_TRACE_INGEST=1 \
    python scripts/profile_trace.py pose
run trace_seg_mi  2400 env CBINFER_TRACE_STATS=mean CBINFER_TRACE_INGEST=1 \
    python scripts/profile_trace.py seg
run trace_mi      2400 env CBINFER_TRACE_STATS=mean CBINFER_TRACE_INGEST=1 \
    python scripts/profile_trace.py scene
run policy_pg     5400 python scripts/optimize_policy.py pose_graph
run policy_seg    5400 python scripts/optimize_policy.py seg
run eval_all      7200 python scripts/eval_headline.py all
run bench_dag     2400 python scripts/bench_pose_graph.py --height 720 \
    --width 1280 --frames 12 --chunks 2
echo "=== queue13 done $(date -u +%H:%M:%S)"
