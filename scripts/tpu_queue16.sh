#!/bin/bash
# r3 queue 16: the queue15 MSA probes, launched on the fresh VM (queue15's
# wait-for-queue14 is moot after the reboot). Same probe set.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"
echo "=== queue16 start $(date -u +%H:%M:%S)"
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}
P="python scripts/probe_msa_flags.py"
run msa_base_pose    1200 $P pose
run msa_pf0_pose     1200 env LIBTPU_INIT_ARGS=--xla_msa_max_outstanding_prefetches=0 $P pose
run msa_vmem_pose    1200 env LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=98304 $P pose
run msa_ratio_pose   1200 env LIBTPU_INIT_ARGS=--xla_tpu_msa_inefficient_use_to_copy_ratio=0.5 $P pose
run msa_base_scene   1200 $P scene
run msa_pf0_scene    1200 env LIBTPU_INIT_ARGS=--xla_msa_max_outstanding_prefetches=0 $P scene
run msa_vmem_scene   1200 env LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=98304 $P scene
run msa_ratio_scene  1200 env LIBTPU_INIT_ARGS=--xla_tpu_msa_inefficient_use_to_copy_ratio=0.5 $P scene
echo "=== queue16 done $(date -u +%H:%M:%S)"
