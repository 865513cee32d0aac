#!/bin/bash
# r3 queue 9: finish queue8's interrupted tail in one session.
#  - bench_multistream: restore the multistream row that queue8's
#    eval_headline regeneration clobbered (merge key was model-only;
#    fixed to (model, mode) in eval_headline.py).
#  - bench.py: the headline driver script, killed mid-run at 05:09.
#  - exp_tau_ab: settle whether flat tau=0.02 really outruns tuned
#    0.15x6 under one compiled program (EXP_tau_ab.json).
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

run multistream 1800 python scripts/bench_multistream.py
run bench 1800 python bench.py
run tau_ab 2400 python scripts/exp_tau_ab.py scene 32 3
echo "=== queue9 done $(date -u +%H:%M:%S)"
