#!/bin/bash
# r3 queue 19: full measured-artifact regeneration at HEAD — the
# --xla_msa_max_outstanding_prefetches=0 adoption (tpu_env.py, +26..44%
# CB with dense unchanged, MSA_FLAGS.json) and the fused-consumer-detect
# opt-out default (EXP_fused_ab.json). RESULTS.json rows, PROFILE,
# LATENCY, multistream, DAG row, per-stage traces, figures all carry the
# pre-pf0 operating point and are re-measured fresh.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"
echo "=== queue19 start $(date -u +%H:%M:%S)"
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}
run bench_pf0       2400 python bench.py
run eval_all        7200 python scripts/eval_headline.py all
run posegraph_720   2400 python scripts/bench_pose_graph.py --height 720 --width 1280 --frames 12
run multistream     2400 python scripts/bench_multistream.py
run latency         2400 python scripts/bench_latency.py
run prof_stages     2400 python scripts/profile_stages.py
run trace_scene     1800 python scripts/profile_trace.py scene
run trace_seg       1800 python scripts/profile_trace.py seg
run trace_pose      1800 python scripts/profile_trace.py pose
run trace_posegraph 1800 python scripts/profile_trace.py pose_graph
run figures         900  python scripts/plot_results.py
echo "=== queue19 done $(date -u +%H:%M:%S)"
