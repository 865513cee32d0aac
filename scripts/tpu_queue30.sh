#!/bin/bash
# r4 queue 30: seg operating-point refresh on the r4 video distribution
# (near-gray backgrounds) + pointwise-conv A/B + the pillar guard rerun.
# The r4 pillar run caught seg at 0.00996 GT degradation on a fresh
# seed: its weights and its 0.15x9 tau vector predate the background
# change. Retrain -> retune -> re-eval, then prove the guard green.
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"
echo "=== queue30 start $(date -u +%H:%M:%S)"
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}
gate() { python scripts/wait_tpu.py 3600 120; }

gate && run train_seg 3600 python scripts/train_seg.py
gate && run tune_seg 7200 python scripts/tune_model.py seg
# eval_headline "all" is subprocess-per-family since r4 (in-process
# sequencing degraded later families 2.7x) — regenerates every row at
# the standalone/deployment form
gate && run eval_all_iso 7200 python scripts/eval_headline.py all
# pointwise-conv-as-matmul A/B (gate default flips only on a measured win)
gate && run pointwise_ab_scene 2400 python scripts/exp_pointwise_ab.py scene 5
# per-workload pillar guard, subprocess-isolated — must be green
gate && run tpu_pillar_tests2 5400 env CBINFER_TPU_TESTS=1 \
  python -m pytest tests/test_tpu_perf.py -q -p no:cacheprovider
echo "=== queue30 done $(date -u +%H:%M:%S)"
