#!/bin/bash
# r3 continuation queue: runs after the catch-up queue (smoke/out_dense/
# ms_waves) exits. Regenerates the attributed per-stage trace, then runs
# the measured backend-policy searches (weakest rows first). The eval
# regen + final bench live in tpu_queue5.sh (after the refresh
# validations of tpu_queue4.sh). Each step timeout-bounded; failures
# don't stop the queue.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"

WAIT_PID=${1:?usage: tpu_queue3.sh <pid-of-main-queue>}
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
echo "=== queue3 start $(date -u +%H:%M:%S)"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}

run trace_scene  1800 python scripts/profile_trace.py scene
run policy_pose  5400 python scripts/optimize_policy.py pose --max-layers 12
run policy_seg   3600 python scripts/optimize_policy.py seg
run policy_dag   5400 python scripts/optimize_policy.py pose_graph --max-layers 10
echo "=== queue3 done $(date -u +%H:%M:%S)"
