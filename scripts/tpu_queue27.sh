#!/bin/bash
# r3 queue 27: replaces queues 25/26 after the axon terminal stopped
# answering session claims mid-session (first op blocks; enumeration
# succeeds — see scripts/wait_tpu.py). Every phase re-gates on the
# tunnel so a recovery at any point resumes the work, and a dead tunnel
# costs minutes, not the phases' full timeouts.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"
echo "=== queue27 start $(date -u +%H:%M:%S)"
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}
gate() { python scripts/wait_tpu.py 3600 120; }

# 1. multistream row at the fixed (uint8-argmax) output form
gate && run multistream_u8 2400 python scripts/bench_multistream.py
# 2. fused-detect A/B with the wiring live
gate && run fused_ab_pose 2400 python scripts/exp_fused_ab.py pose 5
gate && run fused_ab_seg  2400 python scripts/exp_fused_ab.py seg 5
run harvest 300 python scripts/harvest_fused_ab.py
# 3. ev0 adoption repeats (interleaved arms)
P="python scripts/probe_msa_flags.py"
for r in 1 2 3; do
  gate && run msa_rep${r}_pf0_pose 1800 $P pose
  gate && run msa_rep${r}_ev0_pose 1800 env LIBTPU_INIT_ARGS="--xla_msa_max_outstanding_prefetches=0 --xla_msa_max_outstanding_evictions=0" $P pose
done
echo "=== queue27 done $(date -u +%H:%M:%S)"
