#!/bin/bash
# r3 queue 11: ship-form A/B for the mean-stats + clip-resident-ingest
# scan (runner.scan_video collect_stats="mean" / ingest=True), then the
# full artifact regeneration at the final operating point.
#   1. trace the shipped form (stage split -> PROFILE.json scene_mean_ingest)
#   2. bench.py headline A/B (vs 1521.9 fps committed at stack+per-frame)
#   3. eval_headline all -> RESULTS.json rows (consumes queue10 policies)
#   4. DAG bench at its validated cadence
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"

WAIT_PID=${1:?usage: tpu_queue11.sh <pid-of-queue10>}
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
echo "=== queue11 start $(date -u +%H:%M:%S)"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}

run trace_mi   1800 env CBINFER_TRACE_STATS=mean CBINFER_TRACE_INGEST=1 \
    python scripts/profile_trace.py scene
run bench_v3   1800 python bench.py
run eval_all   7200 python scripts/eval_headline.py all
run bench_dag  2400 python scripts/bench_pose_graph.py --height 720 \
    --width 1280 --frames 12 --chunks 2
echo "=== queue11 done $(date -u +%H:%M:%S)"
