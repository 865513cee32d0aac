#!/bin/bash
# r3 queue 4: runs after queue3 (policy searches). Regenerates the trace
# with the HLO-definition fallback (identifies the anonymous pad/copy
# glue buffers), then measures refresh-cadence drift for the sequential
# workloads (validate_refresh). The eval regen + final bench follow in
# tpu_queue5.sh once REFRESH/POLICY files exist.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"

WAIT_PID=${1:?usage: tpu_queue4.sh <pid-of-queue3>}
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
echo "=== queue4 start $(date -u +%H:%M:%S)"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}

run trace_scene2   1800 python scripts/profile_trace.py scene
run refresh_pose   3600 python scripts/validate_refresh.py pose
run refresh_seg    3600 python scripts/validate_refresh.py seg
run refresh_scene  2400 python scripts/validate_refresh.py scene
run refresh_hard   2400 python scripts/validate_refresh.py scene_hard
echo "=== queue4 done $(date -u +%H:%M:%S)"
