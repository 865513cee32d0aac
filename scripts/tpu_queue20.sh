#!/bin/bash
# r3 queue 20: follow-up libtpu flag probes on top of the adopted pf0
# (tpu_env.py appends pf0 unless the env pins the same key, so each run
# below is pf0+variant unless it overrides prefetches itself). Dense twin
# timed in-process per probe_msa_flags. Waits for queue19's log marker.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"
while ! grep -q "queue19 done" "$LOG/queue19.log" 2>/dev/null; do sleep 60; done
echo "=== queue20 start $(date -u +%H:%M:%S)"
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}
P="python scripts/probe_msa_flags.py"
run msa_ev0_pose    1800 env LIBTPU_INIT_ARGS=--xla_msa_max_outstanding_evictions=0 $P pose
run msa_ev0_scene   1800 env LIBTPU_INIT_ARGS=--xla_msa_max_outstanding_evictions=0 $P scene
run msa_pf1_pose    1800 env LIBTPU_INIT_ARGS=--xla_msa_max_outstanding_prefetches=1 $P pose
run msa_pf1_scene   1800 env LIBTPU_INIT_ARGS=--xla_msa_max_outstanding_prefetches=1 $P scene
run msa_xpp0_pose   1800 env LIBTPU_INIT_ARGS=--xla_msa_max_cross_program_prefetches=0 $P pose
run msa_xpp0_scene  1800 env LIBTPU_INIT_ARGS=--xla_msa_max_cross_program_prefetches=0 $P scene
echo "=== queue20 done $(date -u +%H:%M:%S)"
