#!/bin/bash
# r3 queue 5 (final): DAG refresh validation, then the full eval regen
# at the final configuration (policies + validated cadences), the 720p
# DAG bench, and the headline bench.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"

WAIT_PID=${1:?usage: tpu_queue5.sh <pid-of-queue4>}
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
echo "=== queue5 start $(date -u +%H:%M:%S)"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}

run refresh_dag  3600 python scripts/validate_refresh.py pose_graph
run eval_all     7200 python scripts/eval_headline.py all
run bench_dag    2400 python scripts/bench_pose_graph.py --height 720 --width 1280 --frames 12 --chunks 2
run bench        1800 python bench.py
echo "=== queue5 done $(date -u +%H:%M:%S)"
