#!/bin/bash
# r3 queue 8: regenerate every headline row in ONE healthy session.
# RESULTS.json currently mixes sessions: scene/seg rows came from the
# 00:16 run that queue7 showed was a degraded tunnel (pose re-measured
# 345->453 fps in a clean session), the pose row is fresh. One suite
# run makes rows comparable and RESULTS.md's table consistent.
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

run eval_all 4800 python scripts/eval_headline.py all
run pose_graph 2400 python scripts/bench_pose_graph.py --height 720 --width 1280
run bench 1800 python bench.py
echo "=== queue8 done $(date -u +%H:%M:%S)"
