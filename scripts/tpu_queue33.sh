#!/bin/bash
# r5 queue 33: reordered remainder of queue32 after its refresh_seg leg
# hit a tunnel flap (FATAL at backend init) — seg's cadence must be
# re-validated on the graded distribution BEFORE eval consumes it, and
# the tail is re-prioritized (VERDICT items first, guards last) in case
# the round ends mid-queue. probe_flat4 re-runs at T=256: the first run
# returned all-negative garbage (tunnel jitter >> 64-frame windows).
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"
echo "=== queue33 start $(date -u +%H:%M:%S)"
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}
gate() { python scripts/wait_tpu.py 2400 120; }

gate && run refresh_seg2 5400 python scripts/validate_refresh.py seg
gate && run refresh_pose_graph 5400 python scripts/validate_refresh.py pose_graph
gate && run eval_all 7200 python scripts/eval_headline.py all
gate && run changerate 3600 python scripts/bench_changerate.py 3
gate && run realfootage 2400 python scripts/real_footage_demo.py 96
gate && run latency 3600 python scripts/bench_latency.py
gate && run inprocess 3600 python scripts/probe_inprocess.py
gate && run multistream 2400 python scripts/bench_multistream.py
gate && run tau_ab_seg 2400 python scripts/exp_tau_ab.py seg
gate && run policy_seg 3600 python scripts/optimize_policy.py seg
gate && run probe_d_pg 2400 python scripts/probe_stepper.py D pose_graph
gate && run probe_flat4_t256 2400 python scripts/probe_flat4_ingest.py 5 256
gate && run tpu_tests 7200 env CBINFER_TPU_TESTS=1 \
  python -m pytest tests/test_tpu_perf.py -q -p no:cacheprovider
echo "=== queue33 done $(date -u +%H:%M:%S)"
