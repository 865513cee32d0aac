#!/bin/bash
# r5 queue 36: queue35 with --stress-only re-validation (the T=192 sweep
# reproduced seg's vector exactly, so only the deployment gate needs the
# longer horizon; pose's gate will demote its vector to the fastest
# in-budget fallback). Saves ~20 min/attempt on a flap-heavy night.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"
echo "=== queue36 start $(date -u +%H:%M:%S)"
run() {
  name=$1; tmo=$2; shift 2
  for att in 1 2 3; do
    python scripts/wait_tpu.py 2400 120 || continue
    echo "=== $name attempt $att start $(date -u +%H:%M:%S)"
    timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
    rc=$?
    echo "=== $name attempt $att rc=$rc end $(date -u +%H:%M:%S)"
    [ $rc -eq 0 ] && return 0
  done
  return 1
}

run stress_seg 3600 python scripts/tune_model.py seg --stress-only
run stress_pose 3600 python scripts/tune_model.py pose --stress-only
run refresh_seg3 5400 python scripts/validate_refresh.py seg
run refresh_pose2 5400 python scripts/validate_refresh.py pose
run eval_seg 3600 python scripts/eval_headline.py seg
run eval_pose 3600 python scripts/eval_headline.py pose
run changerate 3600 python scripts/bench_changerate.py 3
run realfootage 2400 python scripts/real_footage_demo.py 96
run latency 3600 python scripts/bench_latency.py
run inprocess 3600 python scripts/probe_inprocess.py
run multistream 2400 python scripts/bench_multistream.py
run tau_ab_seg 2400 python scripts/exp_tau_ab.py seg
run probe_flat4_t256 2400 python scripts/probe_flat4_ingest.py 5 256
run probe_d_pg 2400 python scripts/probe_stepper.py D pose_graph
run tpu_tests 7200 env CBINFER_TPU_TESTS=1 python -m pytest tests/test_tpu_perf.py -q -p no:cacheprovider
echo "=== queue36 done $(date -u +%H:%M:%S)"
