#!/bin/bash
# r3 queue 15: MSA staging-copy flag probes (probe_msa_flags.py).
# The pose trace (PROFILE.json stages[pose], 23:13) attributes ~400 us of
# the 1616 us frame to MSA prefetch/evict copy pairs of the aliased cache
# operands — the largest single wall on the deep nets (scene: ~114 us of
# 657). Global MSA disable loses (RESULTS.md); these are the surgical
# knobs present in this libtpu build. Each probe is its own process
# (LIBTPU_INIT_ARGS is init-time) with the compile cache disabled.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"

WAIT_PID=${1:?usage: tpu_queue15.sh <pid-of-queue14>}
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
echo "=== queue15 start $(date -u +%H:%M:%S)"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}

P="python scripts/probe_msa_flags.py"
run msa_base_scene   1200 $P scene
run msa_pf0_scene    1200 env LIBTPU_INIT_ARGS=--xla_msa_max_outstanding_prefetches=0 $P scene
run msa_vmem_scene   1200 env LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=98304 $P scene
run msa_ratio_scene  1200 env LIBTPU_INIT_ARGS=--xla_tpu_msa_inefficient_use_to_copy_ratio=0.5 $P scene
run msa_base_pose    1200 $P pose
run msa_pf0_pose     1200 env LIBTPU_INIT_ARGS=--xla_msa_max_outstanding_prefetches=0 $P pose
run msa_vmem_pose    1200 env LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=98304 $P pose
run msa_ratio_pose   1200 env LIBTPU_INIT_ARGS=--xla_tpu_msa_inefficient_use_to_copy_ratio=0.5 $P pose
echo "=== queue15 done $(date -u +%H:%M:%S)"
