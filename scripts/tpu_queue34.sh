#!/bin/bash
# r5 queue 34: queue33 with PER-STAGE RETRIES — tonight's tunnel flaps
# every few minutes (wait_tpu passes, then the stage's first real op
# hangs and devices_or_die kills it 180 s later). Each stage now gets
# up to 3 attempts, each behind a fresh gate.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"
echo "=== queue34 start $(date -u +%H:%M:%S)"
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

run refresh_seg2 5400 python scripts/validate_refresh.py seg
run refresh_pose_graph 5400 python scripts/validate_refresh.py pose_graph
run eval_all 7200 python scripts/eval_headline.py all
run changerate 3600 python scripts/bench_changerate.py 3
run realfootage 2400 python scripts/real_footage_demo.py 96
run latency 3600 python scripts/bench_latency.py
run inprocess 3600 python scripts/probe_inprocess.py
run multistream 2400 python scripts/bench_multistream.py
run tau_ab_seg 2400 python scripts/exp_tau_ab.py seg
run policy_seg 3600 python scripts/optimize_policy.py seg
run probe_d_pg 2400 python scripts/probe_stepper.py D pose_graph
run probe_flat4_t256 2400 python scripts/probe_flat4_ingest.py 5 256
run tpu_tests 7200 env CBINFER_TPU_TESTS=1 python -m pytest tests/test_tpu_perf.py -q -p no:cacheprovider
echo "=== queue34 done $(date -u +%H:%M:%S)"
