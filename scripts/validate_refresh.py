"""Measured refresh-cadence validation (the drift/throughput knob).

The accepted-value cache rule lets every cache drift up to tau from the
exactly-computed value indefinitely (layers.py module doc; the analytic
worst-case bound is in golden.py's bounded-error property), so production
streams run a chunk-start dense refresh prolog (runner.scan_video
``refresh_start``). The refresh tax is workload-dependent — pose pays a
dense-equivalent prolog every 24 frames (~12% of its CB frame); scene's
interval-64 prolog costs ~0.15 ms/frame — so the right cadence is a
measured accuracy/throughput trade, exactly like the per-layer taus
(arXiv 1808.05488 §V tunes against a degradation budget; the refresh
knob has no reference equivalent because its streams were short clips).

This script measures GROUND-TRUTH degradation (mIoU or GT-PCK, the
BASELINE pillar) and CB-vs-dense agreement as a function of refresh
cadence over a long horizon (default 12 chunks = 6x the shipped pose
interval) on fixed calibration seeds, reporting both the horizon mean
and the WORST single chunk (drift peaks just before a refresh). On TPU
it writes REFRESH_{model}.json; scripts/eval_headline.py consumes the
validated ``refresh_every_chunks`` when present (default 2).

Usage: python scripts/validate_refresh.py pose [--cadences 2,4,8,0]
       (cadence R = refresh prolog on every R-th chunk; 0 = never —
        cold start only, the unbounded-drift reference point)
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cbinfer_tpu import zoo
from cbinfer_tpu.config import PipelineConfig, TileConfig
from cbinfer_tpu.runner import scan_video
from cbinfer_tpu.video import (SpriteVideo, SpriteVideoConfig,
                               workload_video_kwargs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", nargs="?", default="pose",
                    choices=tuple(zoo.names()))
    ap.add_argument("--h", type=int, default=720)
    ap.add_argument("--w", type=int, default=1280)
    ap.add_argument("--t", type=int, default=None,
                    help="frames per chunk (default: eval parity — 12 for "
                    "pose, 32 otherwise)")
    ap.add_argument("--chunks", type=int, default=12)
    ap.add_argument("--cadences", default="2,4,8,0")
    ap.add_argument("--seeds", default="0,1")
    ap.add_argument("--budget", type=float, default=0.005,
                    help="max acceptable WORST-chunk GT degradation for a "
                    "cadence to validate (same scale as the 0.5%% pillar)")
    ap.add_argument("--tau", type=float, default=None,
                    help="flat tau override (trial sweeps at candidate "
                    "operating points — e.g. the stress-validated "
                    "tuned_xS scaled vectors are uniform, so a flat "
                    "value reproduces them)")
    ap.add_argument("--no-write", action="store_true",
                    help="print rows but leave REFRESH_<model>.json "
                    "untouched (trial runs must not change the cadence "
                    "consumers load)")
    args = ap.parse_args()

    from cbinfer_tpu.benchmark import devices_or_die
    on_tpu = any(d.platform == "tpu" for d in devices_or_die())
    H, W = args.h, args.w
    T = args.t or (12 if args.model.startswith("pose") else 32)
    cadences = [int(c) for c in args.cadences.split(",")]
    seeds = [int(s) for s in args.seeds.split(",")]

    entry = zoo.REGISTRY[args.model]
    metric = entry.metric
    classes = entry.model_kwargs.get("num_classes", 8)
    cfg = PipelineConfig(
        tile=TileConfig(8, 8, capacity_fraction=0.375),
        backend="pallas" if on_tpu else "jnp",
        compute_dtype="bfloat16" if on_tpu else "float32",
        cache_dtype="bfloat16" if on_tpu else "float32")
    wl = zoo.load(args.model, (H, W, 3), cfg, tau=args.tau)
    net, params = wl.net, wl.params
    taus = jnp.asarray(wl.taus, jnp.float32)
    if wl.kind == "graph":
        from cbinfer_tpu.graph import node_out_shapes
        stride = H // node_out_shapes(net.nodes, (H, W, 3))[net.output][0]
    else:
        from cbinfer_tpu.network import out_shapes
        stride = H // out_shapes(net.specs, (H, W, 3))[-1][0]

    # device-scalar metrics per chunk (full output fetches cost ~10 s per
    # 44 MB over this tunnel — RESULTS.md): iu count vectors for miou,
    # one pck scalar (+ host-known valid count) for pose
    if metric == "miou":
        from cbinfer_tpu.metrics import iu_maps_device, merge_iu
        iu_gt = jax.jit(lambda y, l: iu_maps_device(
            jnp.argmax(y, -1).astype(jnp.uint8), l, classes))
        iu_agree = jax.jit(lambda a, b: iu_maps_device(
            jnp.argmax(a, -1).astype(jnp.uint8),
            jnp.argmax(b, -1).astype(jnp.uint8), classes))
    else:
        from cbinfer_tpu.metrics import pck_device, pck_gt_device
        from cbinfer_tpu.video import NUM_KEYPOINTS
        pck_gt_j = jax.jit(
            lambda y, pk: pck_gt_device(y, pk, stride))
        pck_agree = jax.jit(lambda a, b: pck_device(
            a[..., -NUM_KEYPOINTS:], b[..., -NUM_KEYPOINTS:]))

    dense_scan = jax.jit(lambda p, fs: jax.lax.map(
        lambda x: net.apply_dense(p, x), fs))
    cb_refresh = jax.jit(
        lambda p, fs, st, tv: scan_video(net, p, fs, state=st,
                                         thresholds=tv, refresh_start=True),
        donate_argnums=(2,))
    cb_plain = jax.jit(
        lambda p, fs, st, tv: scan_video(net, p, fs, state=st,
                                         thresholds=tv),
        donate_argnums=(2,))

    rows = []
    # video statistics match the bench that consumes the validated
    # cadence (eval_headline: 4 sprites/48px; bench_pose_graph: 3/32)
    n_spr, spr_sz = (3, 32) if wl.kind == "graph" else (4, 48)
    for seed in seeds:
        video = SpriteVideo(SpriteVideoConfig(
            height=H, width=W, n_sprites=n_spr, sprite_size=spr_sz,
            speed=4.0, noise_std=0.002,
            distinct_classes=(metric == "pck"),
            seed=seed, **workload_video_kwargs(args.model)))
        chunks, labels = [], []
        for _ in range(args.chunks):
            if metric == "pck":
                f, k, v = video.clip_with_keypoints(T)
                packed = np.concatenate(
                    [k, v[..., None].astype(np.float32)], axis=-1)
                labels.append(jnp.asarray(packed))
            else:
                f, l = video.clip_with_labels(T)
                labels.append(jnp.asarray(l[:, ::stride, ::stride]))
            chunks.append(jnp.asarray(f))
        for c in chunks:
            _ = float(jnp.sum(c))  # device-resident

        # dense reference, cadence-independent: per-chunk GT metric
        dense_outs = [dense_scan(params, c) for c in chunks]
        if metric == "miou":
            dense_iu = [tuple(np.asarray(x, np.int64)
                              for x in iu_gt(d, l))
                        for d, l in zip(dense_outs, labels)]
        else:
            dense_pck = [float(pck_gt_j(d, l))
                         for d, l in zip(dense_outs, labels)]

        for cad in cadences:
            state = net.init_state()
            per_chunk = []
            for i, (c, l) in enumerate(zip(chunks, labels)):
                use_refresh = cad > 0 and i % cad == 0
                f = cb_refresh if use_refresh else cb_plain
                ys, state, _ = f(params, c, state, taus)
                if metric == "miou":
                    gi, gu = (np.asarray(x, np.int64) for x in iu_gt(ys, l))
                    di, du = dense_iu[i]
                    per_chunk.append({
                        "chunk": i,
                        "degradation": merge_iu(di, du) - merge_iu(gi, gu),
                        "agreement": float(merge_iu(*[
                            np.asarray(x, np.int64)
                            for x in iu_agree(ys, dense_outs[i])])),
                    })
                else:
                    per_chunk.append({
                        "chunk": i,
                        "degradation": dense_pck[i] - float(pck_gt_j(ys, l)),
                        "agreement": float(pck_agree(ys, dense_outs[i])),
                    })
            worst = max(per_chunk, key=lambda r: r["degradation"])
            row = {
                "seed": seed, "cadence": cad,
                "interval_frames": cad * T if cad else None,
                "horizon_frames": args.chunks * T,
                "mean_degradation": round(float(np.mean(
                    [r["degradation"] for r in per_chunk])), 5),
                "worst_chunk_degradation": round(worst["degradation"], 5),
                "worst_chunk": worst["chunk"],
                "min_agreement": round(min(r["agreement"]
                                           for r in per_chunk), 4),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    # validated cadence: the LARGEST interval whose worst chunk stays
    # within budget on every seed (0 = never qualifies only if even the
    # unbounded-drift run is clean on the whole horizon)
    ok_by_cad = {}
    for cad in cadences:
        worst = max(r["worst_chunk_degradation"]
                    for r in rows if r["cadence"] == cad)
        ok_by_cad[cad] = worst
    valid = [c for c, w in ok_by_cad.items() if w <= args.budget]
    # order: prefer larger finite intervals; "never" (0) last — an
    # unbounded stream should keep SOME bound even if the horizon is clean
    finite = sorted([c for c in valid if c > 0])
    chosen = finite[-1] if finite else None
    result = {
        "model": args.model, "metric": metric, "T": T,
        "shape": [H, W],  # consumers parity-check T+shape (zoo loader)
        "chunks": args.chunks, "budget": args.budget,
        "worst_by_cadence": {str(k): round(v, 5)
                             for k, v in ok_by_cad.items()},
        "refresh_every_chunks": chosen,
        "rows": rows,
        "note": ("cadence R = refresh prolog every R-th T-frame chunk; "
                 "worst_chunk_degradation is the max over the horizon "
                 "(drift peaks just before a refresh); cadence 0 = cold "
                 "start only (unbounded drift reference)"),
    }
    print(json.dumps({k: v for k, v in result.items() if k != "rows"}))
    if args.no_write or args.tau is not None:
        print("trial run (--no-write / --tau): REFRESH json untouched")
        return
    if not on_tpu:
        print("not on TPU: skipping REFRESH json write "
              "(CPU drift is f32 — not the shipped bf16 regime)")
        return
    out = f"/root/repo/REFRESH_{args.model}.json"
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
