#!/bin/bash
# r3 queue 6: after the final eval/bench (queue5), regenerate the
# attributed per-stage traces for pose and seg (their PROFILE.json
# stage entries predate the named-scope + HLO-metadata join), so the
# per-workload glue split in RESULTS.md is measured, not inferred.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"

WAIT_PID=${1:?usage: tpu_queue6.sh <pid-of-queue5>}
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
echo "=== queue6 start $(date -u +%H:%M:%S)"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}

run refresh_hard2 2400 python scripts/validate_refresh.py scene_hard
run trace_pose 2400 python scripts/profile_trace.py pose
run trace_seg  2400 python scripts/profile_trace.py seg
echo "=== queue6 done $(date -u +%H:%M:%S)"
