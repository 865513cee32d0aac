#!/bin/bash
# r5 queue 32: post-retune validation + full artifact regen at the graded
# operating points, ordered by VERDICT r5 priority — refresh validation
# and eval first (every pillar claim depends on them), then the new r5
# artifacts (change-rate sweep, real footage, live latency with the
# no-stats form + dense rows), then policy re-runs under the collapse
# guards and the root-cause probe, then the on-chip test suite.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"
echo "=== queue32 start $(date -u +%H:%M:%S)"
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}
gate() { python scripts/wait_tpu.py 3600 120; }

gate && run probe_d_pose_graph2 2400 python scripts/probe_stepper.py D pose_graph
gate && run probe_flat4_v2 1800 python scripts/probe_flat4_ingest.py 5
gate && run refresh_seg 5400 python scripts/validate_refresh.py seg
gate && run refresh_pose 5400 python scripts/validate_refresh.py pose
gate && run refresh_pose_graph 5400 python scripts/validate_refresh.py pose_graph
gate && run eval_all 7200 python scripts/eval_headline.py all
gate && run changerate 3600 python scripts/bench_changerate.py 3
gate && run realfootage 2400 python scripts/real_footage_demo.py 96
gate && run latency 3600 python scripts/bench_latency.py
gate && run tau_ab_seg 2400 python scripts/exp_tau_ab.py seg
gate && run tau_ab_scene 2400 python scripts/exp_tau_ab.py scene
gate && run policy_seg 3600 python scripts/optimize_policy.py seg
gate && run policy_pose_graph 3600 python scripts/optimize_policy.py pose_graph
gate && run inprocess 3600 python scripts/probe_inprocess.py
gate && run multistream 2400 python scripts/bench_multistream.py
gate && run tpu_tests 7200 env CBINFER_TPU_TESTS=1 \
  python -m pytest tests/test_tpu_perf.py -q -p no:cacheprovider
echo "=== queue32 done $(date -u +%H:%M:%S)"
