#!/bin/bash
# r3 queue 7: re-measure the sequential-pose eval row. The 00:16 eval_all
# run recorded pose at 173.8 cb_fps (1.08x) while every sibling row
# improved and bench_pose_graph (same backbone, same T) measured 2.96x
# five minutes later — consistent with a transient chip/tunnel
# degradation, not a code change (the only eval-path diff since the
# 363-fps row was the refresh-cadence loader, which resolved to the SAME
# default cadence for pose). A clean re-run decides: reproduce -> real
# regression to bisect; recover -> overwrite the anomalous row.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"

WAIT_PID=${1:?usage: tpu_queue7.sh <pid-of-queue6>}
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
echo "=== queue7 start $(date -u +%H:%M:%S)"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}

run eval_pose2 2400 python scripts/eval_headline.py pose
echo "=== queue7 done $(date -u +%H:%M:%S)"
