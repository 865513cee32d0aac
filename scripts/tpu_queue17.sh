#!/bin/bash
# r3 queue 17: full measured-artifact regeneration at HEAD (fused flat4
# detect v2 + mean-stats + clip-resident ingest). RESULTS.json's rows and
# the RESULTS.md headline still carry the pre-fused-detect operating point
# (scene 1268 fps); the reboot lost queue14/15's logs, so everything is
# re-measured fresh: headline bench, all eval rows, DAG row, multistream,
# latency, per-stage traces.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"
WAIT_PID=${1:?usage: tpu_queue17.sh <pid-of-queue16>}
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
echo "=== queue17 start $(date -u +%H:%M:%S)"
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}
run bench_r3final   2400 python bench.py
run eval_all        5400 python scripts/eval_headline.py all
run posegraph_720   2400 python scripts/bench_pose_graph.py --height 720 --width 1280 --frames 12
run multistream     2400 python scripts/bench_multistream.py
run latency         2400 python scripts/bench_latency.py
run prof_stages     2400 python scripts/profile_stages.py
run trace_scene     1800 python scripts/profile_trace.py scene
run trace_seg       1800 python scripts/profile_trace.py seg
run trace_pose      1800 python scripts/profile_trace.py pose
run trace_posegraph 1800 python scripts/profile_trace.py pose_graph
run figures         900  python scripts/plot_results.py
echo "=== queue17 done $(date -u +%H:%M:%S)"
