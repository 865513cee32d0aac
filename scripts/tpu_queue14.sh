#!/bin/bash
# r3 queue 14: clean re-run of bench.py — queue13's bench_v3 (1330 fps)
# was contended by a stray axon-platform process from 22:52-23:01 (it ran
# 26 min instead of 6); re-measure the shipped scan forms without
# interference before judging the mean-stats+ingest A/B vs 1521.9.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"

WAIT_PID=${1:?usage: tpu_queue14.sh <pid-of-queue13>}
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
echo "=== queue14 start $(date -u +%H:%M:%S)"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}

run bench_v4 1800 python bench.py
echo "=== queue14 done $(date -u +%H:%M:%S)"
