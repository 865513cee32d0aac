#!/bin/bash
# r5 queue 31b: resume queue31 after the pose-palette fix (pose PCK 0.0
# on graded+hard at step 1200 -> pose/pose_graph keep default palette,
# video.py profile comment). train_seg + probes already done in 31.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"
echo "=== queue31b start $(date -u +%H:%M:%S)"
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}
gate() { python scripts/wait_tpu.py 3600 120; }

gate && run train_pose 9000 python scripts/train_pose.py
gate && run train_pose_graph 9000 python scripts/train_pose_graph.py
gate && run tune_seg 7200 python scripts/tune_model.py seg
gate && run tune_pose 9000 python scripts/tune_model.py pose
gate && run tune_pose_graph 9000 python scripts/tune_model.py pose_graph
echo "=== queue31b done $(date -u +%H:%M:%S)"
