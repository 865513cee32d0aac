#!/bin/bash
# r3 queue 26: chains after queue25 — retry the multistream re-measure
# (queue25's attempt hit the axon terminal outage) and assemble
# EXP_fused_ab.json from whatever fused-A/B logs landed.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"
# BOUNDED wait (advisor r3): if queue25 died mid-run (the wedge scenario
# this queue exists for), fall through after 40 min and harvest whatever
# landed rather than spinning forever.
for _i in $(seq 40); do
  grep -q "queue25 done" "$LOG/queue25.log" 2>/dev/null && break
  sleep 60
done
echo "=== queue26 start $(date -u +%H:%M:%S)"
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}
run multistream_retry 2400 python scripts/bench_multistream.py
run harvest 300 python scripts/harvest_fused_ab.py
echo "=== queue26 done $(date -u +%H:%M:%S)"
