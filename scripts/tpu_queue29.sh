#!/bin/bash
# r4 queue 29: closure measurements after queue28's artifact regen.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"
echo "=== queue29 start $(date -u +%H:%M:%S)"
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}
gate() { python scripts/wait_tpu.py 3600 120; }

# 1. per-stage trace in the SHIPPED form (r4: classic frame slicing —
#    EXP_stats_ab flipped ingest off — with mean stats, the eval form)
#    with the Modules-lane filter: stage sums should now match the frame
gate && run trace_scene_shipped 1800 env CBINFER_TRACE_STATS=mean \
  python scripts/profile_trace.py scene
# 2. the marked TPU pillar tests (flagship + seg/pose/pose_graph) — the
#    guard VERDICT r3 weak #6 asked for, proven green on-chip once
gate && run tpu_pillar_tests 5400 env CBINFER_TPU_TESTS=1 \
  python -m pytest tests/test_tpu_perf.py -q -p no:cacheprovider
# 3. driver-format headline at HEAD
gate && run bench_headline 1800 python bench.py
echo "=== queue29 done $(date -u +%H:%M:%S)"
# 4. final row regen at the r4 shipped form (classic, per-workload fused
#    policies, pose tuned @720p) so RESULTS.json reflects HEAD exactly
gate && run eval_all_final 3600 python scripts/eval_headline.py all
echo "=== queue29 all done $(date -u +%H:%M:%S)"
