#!/bin/bash
# On-chip work queue for when the axon tunnel returns (r3):
#   1. measured per-layer backend policies (optimize_policy) for the
#      weakest rows first (pose seq 2.24x, pose DAG 2.58x), then seg/scene
#   2. regenerate RESULTS.json at the capacity-0.375 parity config
#   3. bench.py sanity
# Each step is timeout-bounded and logged; a step failing does not stop
# the queue (the chip may wedge mid-queue — see memory notes).
set -u
cd /root/repo
LOG=/root/repo/.queue_logs
mkdir -p "$LOG"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  rc=$?
  echo "--- $name rc=$rc; tail:"
  tail -3 "$LOG/$name.log"
}

# 0. smoke FIRST: the r3 session edited the Pallas kernels after the last
#    on-chip run (detect scratch dtype, divisor chunking, pool store casts,
#    shared hint_origin, pool input-cache elision) — re-verify Mosaic
#    compile + on-chip correctness + flagship margin before burning hours
#    on policy search against possibly-broken kernels.
run smoke           2400 env CBINFER_TPU_TESTS=1 python -m pytest tests/test_tpu_perf.py -x -q

# 0b. the row-band sparse stem candidate (layers.py band_cached): the stem
#     is 65% of the 720p scene CB frame (PROFILE r3) — measure it before
#     the policy search so a winning stem can inform the shipped config.
run exp_stem        3600 python scripts/exp_variants.py stem
# 0c. output-form cost: logits stacking vs uint8 argmax maps (out_map)
run exp_out         1200 python scripts/exp_variants.py out

# each trial recompiles the whole net (~1-2 min at 720p): bound the
# candidate count so a queue step fits its timeout
run policy_pose     5400 python scripts/optimize_policy.py pose --max-layers 12
run policy_seg      3600 python scripts/optimize_policy.py seg
run policy_scene    2400 python scripts/optimize_policy.py scene
run policy_hard     2400 python scripts/optimize_policy.py scene_hard
run policy_dag      5400 python scripts/optimize_policy.py pose_graph --max-layers 10
run eval_all        5400 python scripts/eval_headline.py all
# regenerate the per-stage trace WITH the new source attribution (named
# scopes + HLO-metadata join) — the instrument for the next glue hunt
run trace_scene     1800 python scripts/profile_trace.py scene
run bench_dag       1800 python scripts/bench_pose_graph.py
run bench           1200 python bench.py
echo "=== queue done $(date -u +%H:%M:%S) ==="
