#!/bin/bash
# r4 queue 28: post-latency measurement chain. Every phase re-gates on
# the tunnel (scripts/wait_tpu.py) so a wedge costs minutes, not the
# phases' timeouts; every leg writes its own artifact as it lands
# (PROFILE.json / RESULTS.json / ckpts tau) so a kill never orphans a
# finished measurement (VERDICT r3 housekeeping #9).
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"
echo "=== queue28 start $(date -u +%H:%M:%S)"
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}
gate() { python scripts/wait_tpu.py 3600 120; }

# 1. per-stage trace with the fixed self-time attribution (stage sums
#    must now match the measured frame)
gate && run trace_scene 1800 python scripts/profile_trace.py scene
# 2. accuracy + fps rows at the near-gray background (video.py r4) —
#    regenerates every RESULTS.json row family
gate && run eval_all 3600 python scripts/eval_headline.py all
gate && run pose_graph_row 2400 python scripts/bench_pose_graph.py --height 720 --width 1280
# 3. pose per-layer tau at DEPLOYMENT resolution (720p, trimmed grid,
#    scaled-tuned stress fallbacks) — writes ckpts/pose_w64_tau.json +
#    TUNE_pose.json
gate && run tune_pose_720p 7200 python scripts/tune_model.py pose
# 4. pose row regen at whatever tau shipped from step 3
gate && run eval_pose 1800 python scripts/eval_headline.py pose
echo "=== queue28 done $(date -u +%H:%M:%S)"
# 5. observability/ingest forms A/B (EXP_stats_ab.json) — decides
#    whether the timed headline window drops the stat accumulators
gate && run stats_ab 2400 python scripts/exp_stats_ab.py 5
echo "=== queue28 stats_ab done $(date -u +%H:%M:%S)"
# 6. DAG fused-detect A/B + harvest (per-workload adoption)
gate && run fused_ab_pose_graph 2400 python scripts/exp_fused_ab.py pose_graph 5
run harvest2 300 python scripts/harvest_fused_ab.py
echo "=== queue28 all done $(date -u +%H:%M:%S)"
