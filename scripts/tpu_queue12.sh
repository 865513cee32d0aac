#!/bin/bash
# r3 queue 12: per-stage traces of the DEEP workloads in the shipped
# form (mean stats + clip-resident ingest) — pose/seg are the rows
# farthest from their speed-of-light; these traces decide the next
# kernel target (their per-layer detect/pool/glue split has never been
# measured at the current operating point).
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"

WAIT_PID=${1:?usage: tpu_queue12.sh <pid-of-queue11>}
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
echo "=== queue12 start $(date -u +%H:%M:%S)"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}

run trace_pose_mi 2400 env CBINFER_TRACE_STATS=mean CBINFER_TRACE_INGEST=1 \
    python scripts/profile_trace.py pose
run trace_seg_mi  2400 env CBINFER_TRACE_STATS=mean CBINFER_TRACE_INGEST=1 \
    python scripts/profile_trace.py seg
echo "=== queue12 done $(date -u +%H:%M:%S)"
