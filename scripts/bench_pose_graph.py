"""Pose DAG (OpenPose topology) on the real chip (configs[3] / C17).

Compiles and runs the faithful concat-DAG pose network
(models/pose.pose_graph -> graph.convert_graph_flagship) on the TPU with
the pallas backend: backbone -> stage1 {PAF, heatmap} -> stage2 over
concat(backbone, paf1, heat1). Measures CB vs dense throughput under the
deployment refresh policy, PCK agreement, and — with the in-repo-trained
DAG weights (scripts/train_pose_graph.py) — GROUND-TRUTH PCK degradation.
Writes a "pose_graph" row into RESULTS.json.

Usage: python scripts/bench_pose_graph.py [--height 360] [--width 640]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--width", type=int, default=640)
    # default T=12 matches validate_refresh's pose default: the cadence
    # loader is T-parity-guarded, so benching at any other T silently
    # falls back to the conservative cadence 2 and re-pays the refresh
    # tax REFRESH_pose_graph.json already validated away (cadence 8)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--chunks", type=int, default=2)
    ap.add_argument("--tau", type=float, default=None,
                    help="fixed tau override (default: tuned tau file)")
    ap.add_argument("--no-write", action="store_true",
                    help="print the row but do not touch RESULTS.json "
                         "(smoke runs at toy shapes must not clobber "
                         "measured rows)")
    args = ap.parse_args(argv)

    from cbinfer_tpu import zoo
    from cbinfer_tpu.benchmark import measure_sync_overhead, scalar_sync
    from cbinfer_tpu.config import PipelineConfig, TileConfig
    from cbinfer_tpu.graph import node_out_shapes
    from cbinfer_tpu.metrics import pck, pck_gt
    from cbinfer_tpu.runner import scan_video
    from cbinfer_tpu.video import (SpriteVideo, SpriteVideoConfig,
                                   workload_video_kwargs)

    H, W, T = args.height, args.width, args.frames
    from cbinfer_tpu.benchmark import devices_or_die  # bounded: tunnel can hang
    on_tpu = any(d.platform == "tpu" for d in devices_or_die())
    cfg = PipelineConfig(
        tile=TileConfig(8, 8, capacity_fraction=0.375),
        backend="pallas" if on_tpu else "jnp",
        compute_dtype="bfloat16" if on_tpu else "float32",
        cache_dtype="bfloat16" if on_tpu else "float32")
    # one-call workload build (zoo): trained DAG weights + tuned taus +
    # measured POLICY_pose_graph.json backend policy, with provenance
    wl = zoo.load("pose_graph", (H, W, 3), cfg, tau=args.tau)
    for wmsg in wl.warnings:
        print(f"WARNING: {wmsg}", file=sys.stderr)
    net, params = wl.net, wl.params
    nodes, out_name = wl.specs, wl.net.output
    weights, tau_src, policy_src = wl.weights, wl.tau_source, \
        wl.policy_source
    tv = jnp.asarray(wl.taus, jnp.float32)

    # refresh cadence (prolog every R-th chunk): measured drift
    # validation via the parity-guarded zoo loader (refuses a cadence
    # validated at a different T/resolution), else every 2nd chunk.
    # The timed window must span a full period.
    cadence, cadence_src = zoo.load_refresh_cadence("pose_graph", T, H, W)
    args.chunks = max(args.chunks, cadence)

    base = int(time.time() * 1e3) % 100000
    video = SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=3, sprite_size=32, speed=4.0,
        noise_std=0.002, distinct_classes=True, seed=base,
        **workload_video_kwargs("pose_graph")))
    warm = jnp.asarray(video.clip(T))
    chunks, kp_list, valid_list = [], [], []
    for _ in range(args.chunks):
        f, k, v = video.clip_with_keypoints(T)
        chunks.append(jnp.asarray(f))
        kp_list.append(k)
        valid_list.append(v)
    for c in chunks + [warm]:
        scalar_sync(c)
    sync_overhead = measure_sync_overhead()

    # dense baseline — outputs collected DURING the timed pass (dispatch
    # memoization would serve pre-dispatched chunks from cache)
    dense = jax.jit(lambda p, fs: jax.lax.map(
        lambda x: net.apply_dense(p, x), fs))
    scalar_sync(dense(params, warm))  # compile + warm (untimed chunk)
    dense_outs = []
    t0 = time.perf_counter()
    for c in chunks:
        d = dense(params, c)
        dense_outs.append(d)
    scalar_sync(d)
    dense_fps = (args.chunks * T
                 / max(1e-9, time.perf_counter() - t0 - sync_overhead))

    # CB scan under the deployment refresh policy: cond-free refresh_start
    # prolog on every other chunk (interval 2T — eval_headline parity),
    # now available on DAG nets via CBGraphNet.apply_refresh
    # collect_stats="mean": the deployment observability form (see
    # runner.scan_video doc — per-frame stacks cost ~77 us/frame)
    cb_refresh = jax.jit(
        lambda p, fs, st: scan_video(net, p, fs, state=st, thresholds=tv,
                                     refresh_start=True,
                                     collect_stats="mean", ingest=False),
        donate_argnums=(2,))
    cb_plain = jax.jit(
        lambda p, fs, st: scan_video(net, p, fs, state=st, thresholds=tv,
                                     collect_stats="mean", ingest=False),
        donate_argnums=(2,))
    ys, st, stats = cb_refresh(params, warm, net.init_state())
    scalar_sync(ys)
    ys, st, stats = cb_plain(params, warm, st)
    scalar_sync(ys)
    cb_outs, all_stats = [], []
    t0 = time.perf_counter()
    for i, c in enumerate(chunks):
        f = cb_refresh if i % cadence == 0 else cb_plain
        ys, st, stats = f(params, c, st)
        cb_outs.append(ys)
        all_stats.append(stats)
    scalar_sync(ys)
    cb_fps = (args.chunks * T
              / max(1e-9, time.perf_counter() - t0 - sync_overhead))

    pck_val = float(np.mean([pck(np.asarray(a), np.asarray(b))
                             for a, b in zip(cb_outs, dense_outs)]))
    gt = {}
    if weights == "trained(npz)":
        stride = H // node_out_shapes(nodes, (H, W, 3))[out_name][0]
        kps = np.concatenate(kp_list)
        valid = np.concatenate(valid_list)
        cb_np = np.concatenate([np.asarray(a) for a in cb_outs])
        dn_np = np.concatenate([np.asarray(b) for b in dense_outs])
        p_cb = pck_gt(cb_np, kps, valid, stride)
        p_dn = pck_gt(dn_np, kps, valid, stride)
        # tight-radius companion (eval_headline precedent): the alpha=0.05
        # pillar saturates; alpha=0.02 shows real localization headroom
        p_cb_t = pck_gt(cb_np, kps, valid, stride, alpha=0.02)
        p_dn_t = pck_gt(dn_np, kps, valid, stride, alpha=0.02)
        gt = {"pck_gt_dense": round(p_dn, 4), "pck_gt_cb": round(p_cb, 4),
              "pck_degradation": round(p_dn - p_cb, 5),
              "pck02_gt_dense": round(p_dn_t, 4),
              "pck02_gt_cb": round(p_cb_t, 4),
              "pck02_degradation": round(p_dn_t - p_cb_t, 5)}
    # ALL timed chunks — the last chunk alone is the refresh-free one
    # under the alternating policy (same bias class as the FLOP
    # accounting fix in benchmark.py)
    # mean-mode stats: overflow is a per-chunk FRACTION of frames — scale
    # by T to recover the count the row has always reported
    overflows = int(round(sum(
        float(np.asarray(s["overflow"]).sum()) * T
        for cs in jax.device_get(all_stats)
        for s in cs.values() if s)))
    # effective-FLOP reduction over ALL timed chunks (refresh frames
    # included) — topology-agnostic via NetView (C15; BASELINE ">=3x"
    # pillar, previously unreported for the DAG row)
    from cbinfer_tpu.benchmark import concat_stats
    from cbinfer_tpu.metrics import effective_flops_view
    from cbinfer_tpu.netview import NetView
    ef = effective_flops_view(NetView.from_nodes(nodes, (H, W, 3)),
                              concat_stats(all_stats),
                              cfg.tile.tile_h, cfg.tile.tile_w)

    row = {
        "model": "pose_graph", "resolution": f"{H}x{W}",
        "topology": "backbone -> 2 stages x {PAF, heatmap}, concat DAG",
        "weights": weights, "tau": tau_src,
        "refresh": (f"chunk-start prolog every {cadence} chunks, interval "
                    f"{cadence * T} ({cadence_src})"),
        "dense_fps": round(dense_fps, 1), "cb_fps": round(cb_fps, 1),
        "speedup": round(cb_fps / dense_fps, 2),
        "flop_reduction": round(ef["flop_reduction"], 2),
        "pck_vs_dense": round(pck_val, 4),
        **gt,
        "overflow_frames": overflows,
        "backend": cfg.backend,
        "backend_policy": policy_src,
    }
    print(json.dumps(row), flush=True)
    if args.no_write:
        return row
    out = "/root/repo/RESULTS.json"
    results = {"rows": []}
    if os.path.exists(out):
        with open(out) as f:
            results = json.load(f)
    results["rows"] = [r for r in results.get("rows", [])
                       if r.get("model") != "pose_graph"] + [row]
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("updated RESULTS.json")
    return row


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
