"""Pose-DAG accuracy stability sweep (r3): GT-PCK degradation vs seeds.

The sequential-pose sweep (scripts/pose_acc_sweep.py, POSE_ACC.json)
showed 360p-calibrated tuned tau vectors are accuracy-fragile at 720p on
fresh video seeds. The DAG workload's tuned vector is uniformly 0.15
(grid-saturated, ckpts/pose_graph_w64_tau.json) and was calibrated at
360p too, so it carries the same risk; its REFRESH validation used only
seeds 0+1. This sweep measures per-chunk GT-PCK degradation across
seeds x {tau vector} x {refresh cadence} at 720p. Accuracy-only.

Usage: python scripts/graph_acc_sweep.py [n_seeds] [out.json]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cbinfer_tpu import zoo
from cbinfer_tpu.config import PipelineConfig, TileConfig
from cbinfer_tpu.graph import node_out_shapes
from cbinfer_tpu.metrics import pck, pck_gt
from cbinfer_tpu.runner import scan_video
from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig

H, W, T = 720, 1280, 16
CHUNKS = 4


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/GRAPH_ACC.json"
    from cbinfer_tpu.benchmark import devices_or_die
    on_tpu = any(d.platform == "tpu" for d in devices_or_die())
    cfg = PipelineConfig(tile=TileConfig(8, 8, capacity_fraction=0.375),
                         backend="pallas" if on_tpu else "jnp",
                         compute_dtype="bfloat16" if on_tpu else "float32",
                         cache_dtype="bfloat16" if on_tpu else "float32")
    wl = zoo.load("pose_graph", (H, W, 3), cfg, tau=None)
    net, params = wl.net, wl.params
    oh = node_out_shapes(wl.specs, (H, W, 3))[net.output][0]
    stride = H // oh
    n_cb = len(wl.taus)

    tau_vectors = {
        "tuned": list(wl.taus),
        "flat0.04": [0.04] * n_cb,
        "flat0.02": [0.02] * n_cb,
    }
    cadences = [2, 1]  # refresh prolog every Nth chunk (interval N*T frames)

    cb_refresh = jax.jit(
        lambda p, fs, st, tv: scan_video(net, p, fs, state=st,
                                         thresholds=tv, refresh_start=True),
        donate_argnums=(2,))
    cb_plain = jax.jit(
        lambda p, fs, st, tv: scan_video(net, p, fs, state=st,
                                         thresholds=tv),
        donate_argnums=(2,))
    dense_scan = jax.jit(
        lambda p, fs: jax.lax.map(lambda x: net.apply_dense(p, x), fs))

    rows = []
    for s in range(n_seeds):
        seed = 2000 + 77 * s
        video = SpriteVideo(SpriteVideoConfig(
            height=H, width=W, n_sprites=3, sprite_size=32, speed=4.0,
            noise_std=0.002, distinct_classes=True, seed=seed))
        clips, kps, valids = [], [], []
        for _ in range(CHUNKS):
            f, k, v = video.clip_with_keypoints(T)
            clips.append(jnp.asarray(f))
            kps.append(k)
            valids.append(v)
        dense_outs = [np.asarray(dense_scan(params, c)) for c in clips]
        d_pck = [pck_gt(d, k, v, stride)
                 for d, k, v in zip(dense_outs, kps, valids)]
        for tau_name, tv in tau_vectors.items():
            taus = jnp.asarray(tv, jnp.float32)
            for cad in cadences:
                state = net.init_state()
                per_chunk = []
                agree = []
                for i, c in enumerate(clips):
                    f = cb_refresh if i % cad == 0 else cb_plain
                    ys, state, stats = f(params, c, state, taus)
                    y = np.asarray(ys)
                    per_chunk.append(pck_gt(y, kps[i], valids[i], stride))
                    agree.append(pck(y, dense_outs[i]))
                row = {
                    "seed": seed, "taus": tau_name, "cadence": cad,
                    "pck_gt_dense": [round(x, 4) for x in d_pck],
                    "pck_gt_cb": [round(x, 4) for x in per_chunk],
                    "agreement": [round(x, 4) for x in agree],
                    "degradation_mean": round(
                        float(np.mean(d_pck) - np.mean(per_chunk)), 5),
                    "degradation_worst_chunk": round(
                        float(max(d - c for d, c in zip(d_pck, per_chunk))),
                        5),
                }
                rows.append(row)
                print(json.dumps(row), flush=True)
    with open(out_path, "w") as f:
        json.dump({"H": H, "W": W, "T": T, "chunks": CHUNKS,
                   "rows": rows}, f, indent=1)
    print(f"written {out_path}")


if __name__ == "__main__":
    main()
