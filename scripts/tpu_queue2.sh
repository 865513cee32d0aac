#!/bin/bash
# Follow-on queue (r3): waits for the main queue (scripts/tpu_queue.sh)
# to exit, then runs the dense-baseline output-form twin that the first
# "out" step timed out before measuring. Kept separate because a running
# queue script must never be edited in place (bash reads incrementally).
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"

WAIT_PID=${1:?usage: tpu_queue2.sh <pid-of-main-queue>}
echo "waiting for main queue pid $WAIT_PID ..."
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
echo "main queue exited; starting follow-on at $(date -u +%H:%M:%S)"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  rc=$?
  echo "--- $name rc=$rc; tail:"
  tail -3 "$LOG/$name.log"
}

run exp_out_dense   1800 python scripts/exp_variants.py out_dense
# re-measure single-chip multi-stream with the WAVES runner (the stacked
# forms measured 0.35x/0.37x; the RESULTS.json row is marked "pending
# re-measurement") — must run AFTER eval_all so its row survives the regen
run ms_waves        2400 python scripts/bench_multistream.py
echo "=== queue2 done $(date -u +%H:%M:%S) ==="
