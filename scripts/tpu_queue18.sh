#!/bin/bash
# r3 queue 18: pf0 adoption decision — probe_msa_flags now measures the
# DENSE twin in the same process (a flag that sandbags dense would inflate
# the CB ratio dishonestly; adopt only if dense holds).
#
# HISTORICAL: this ran (and MSA_FLAGS.json was recorded) BEFORE tpu_env.py
# started auto-appending pf0 at package import. Re-running it at HEAD
# would compare pf0 vs pf0 — a true baseline now needs the flag pinned to
# libtpu's default explicitly (pinning any value for the key wins over
# the auto-append; tpu_env.ensure_libtpu_flags).
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"
WAIT_PID=${1:?usage: tpu_queue18.sh <pid-of-queue16>}
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
echo "=== queue18 start $(date -u +%H:%M:%S)"
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}
P="python scripts/probe_msa_flags.py"
run msa_d_base_pose  1800 $P pose
run msa_d_pf0_pose   1800 env LIBTPU_INIT_ARGS=--xla_msa_max_outstanding_prefetches=0 $P pose
run msa_d_base_scene 1800 $P scene
run msa_d_pf0_scene  1800 env LIBTPU_INIT_ARGS=--xla_msa_max_outstanding_prefetches=0 $P scene
echo "=== queue18 done $(date -u +%H:%M:%S)"
