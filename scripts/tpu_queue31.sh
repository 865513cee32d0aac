#!/bin/bash
# r5 queue 31: (a) probe the K=1 dispatch-floor knobs (stats packing /
# carry arenas / bound params — runner.py r5, probe_stepper probe D) on
# pose_graph and scene; (b) retrain seg/pose/pose_graph on the GRADED-
# change hard-palette distribution (video.workload_video_kwargs — the r5
# fix for the degenerate tau trade-off, VERDICT r4 missing #1) and re-run
# the threshold auto-tuner on the same distribution.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"
echo "=== queue31 start $(date -u +%H:%M:%S)"
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}
gate() { python scripts/wait_tpu.py 3600 120; }

gate && run probe_d_pose_graph 2400 python scripts/probe_stepper.py D pose_graph
gate && run probe_d_scene 2400 python scripts/probe_stepper.py D scene
gate && run train_seg 7200 python scripts/train_seg.py
gate && run train_pose 9000 python scripts/train_pose.py
gate && run train_pose_graph 9000 python scripts/train_pose_graph.py
gate && run tune_seg 7200 python scripts/tune_model.py seg
gate && run tune_pose 9000 python scripts/tune_model.py pose
gate && run tune_pose_graph 9000 python scripts/tune_model.py pose_graph
echo "=== queue31 done $(date -u +%H:%M:%S)"
