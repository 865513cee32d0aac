"""CLI runner (console script `cbinfer`): convert a model, stream
synthetic or file video, report results.

Examples:
  cbinfer --model scene --height 360 --width 640 --frames 32
  cbinfer --model seg --backend pallas --tau 0.04 --bf16
  cbinfer --model scene --tune --budget 0.005
  cbinfer --video cam.y4m --model scene   # real footage
"""

import argparse
import os
import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("CBINFER_JAX_CACHE",
                   os.path.expanduser("~/.cache/cbinfer_tpu/jax")))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="scene")
    ap.add_argument("--width-mult", type=int, default=64,
                    help="model channel width")
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--tau", type=float, default=0.04)
    ap.add_argument("--tile", type=int, default=8)
    ap.add_argument("--backend", default=None,
                    help="pallas|jnp (default: pallas on TPU)")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--stem",
                    choices=("flagship", "dense_cached", "dense", "cb"),
                    default="flagship",
                    help="layer-0 mode: flagship (dense_cached on pallas — "
                         "convert.flagship_layers), dense_cached "
                         "(HWC detect + dense conv from the accepted "
                         "cache), dense (recompute every frame, no hint), "
                         "cb (default backend delta path)")
    ap.add_argument("--tune", action="store_true",
                    help="run the threshold auto-tuner first")
    ap.add_argument("--budget", type=float, default=0.005)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--video", default=None, metavar="PATH",
                    help="real footage instead of synthetic sprites: .y4m "
                         "(uncompressed YUV4MPEG2 — `ffmpeg -i in.mp4 "
                         "out.y4m`) or .npy/.npz (T,H,W,3) clip; "
                         "--height/--width are taken from the file")
    ap.add_argument("--live", type=int, nargs="?", const=1, default=None,
                    metavar="K",
                    help="live streaming mode (FrameStepper): one "
                         "dispatch per frame (K=1) or per K-frame "
                         "micro-batch (step_chunk — K-1 frames of added "
                         "capture latency buys dispatch-overhead/K; see "
                         "LATENCY.json). Reports wall ms/frame alongside "
                         "the scan-form results")
    ap.add_argument("--json", action="store_true", help="JSON-only output")
    args = ap.parse_args(argv)

    from cbinfer_tpu.config import PipelineConfig, TileConfig
    from cbinfer_tpu.convert import convert, flagship_layers, num_cb_layers
    from cbinfer_tpu.metrics import effective_flops, miou, pck
    from cbinfer_tpu.models import get_model
    from cbinfer_tpu.network import init_params
    from cbinfer_tpu.profiling import summarize_stats
    from cbinfer_tpu.runner import scan_video
    from cbinfer_tpu.tuner import tune
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig

    from cbinfer_tpu.benchmark import devices_or_die  # bounded: tunnel can hang
    on_tpu = any(d.platform == "tpu" for d in devices_or_die())
    backend = args.backend or ("pallas" if on_tpu else "jnp")
    dtype = "bfloat16" if args.bf16 else "float32"
    # pose_cnn has a fixed two-branch head (PAF + heatmap), no num_classes
    specs = (get_model(args.model, width=args.width_mult)
             if args.model == "pose" else
             get_model(args.model, num_classes=args.classes,
                       width=args.width_mult))
    cfg = PipelineConfig(tile=TileConfig(args.tile, args.tile),
                         backend=backend, compute_dtype=dtype,
                         cache_dtype=dtype)
    if args.video:
        from cbinfer_tpu.fileio import open_video
        video = open_video(args.video, loop=True)
        args.height, args.width = video.height, video.width
    else:
        video = SpriteVideo(SpriteVideoConfig(
            height=args.height, width=args.width, n_sprites=4,
            sprite_size=max(16, args.height // 15), speed=4.0,
            noise_std=0.002, seed=args.seed))
    in_shape = (args.height, args.width, 3)
    net = convert(specs, in_shape, cfg,
                  dense_layers=[0] if args.stem == "dense" else [],
                  backend_overrides=(
                      {0: "dense_cached"} if args.stem == "dense_cached"
                      else flagship_layers(specs, (args.height, args.width,
                                                   3), cfg)[0]
                      if args.stem == "flagship" else None))
    params = init_params(specs, in_shape, jax.random.PRNGKey(args.seed))
    clip = jnp.asarray(video.clip(args.frames))

    n_cb = num_cb_layers(net.specs)
    taus = [args.tau] * n_cb
    # pose outputs PAF+heatmap channels — keypoint PCK, not argmax mIoU
    metric_fn = (pck if args.model == "pose"
                 else functools.partial(miou, num_classes=args.classes))
    if args.tune:
        res = tune(net, params, video.clip(max(8, args.frames // 2)),
                   metric_fn, budget=args.budget)
        taus = res.thresholds
        if not args.json:
            print(f"tuned thresholds: {taus}")
            print(f"tuner metric {res.metric:.4f}, "
                  f"flop reduction {res.flop_reduction:.2f}x")

    ys, state, stats = scan_video(net, params, clip,
                                  thresholds=jnp.asarray(taus, jnp.float32))
    dense = jnp.stack([net.apply_dense(params, f) for f in clip])
    m = metric_fn(np.asarray(ys), np.asarray(dense))
    ef = effective_flops(jax.device_get(stats), net.specs, in_shape,
                         args.tile, args.tile)
    out = {
        "model": args.model, "backend": backend,
        "miou_vs_dense": round(m, 4),
        "flop_reduction": round(ef["flop_reduction"], 2),
        "thresholds": [float(t) for t in taus],
    }
    if args.live is not None:
        import time
        from cbinfer_tpu.runner import FrameStepper

        # Sync via scalar fetch, not block_until_ready — the latter is
        # unreliable on this runtime (bench.py timing notes): it can
        # return before device work completes and under-report ms/frame.
        def sync(arr):
            return float(jnp.max(jnp.asarray(arr, jnp.float32).ravel()[:1]))

        K = max(1, args.live)
        # deployment live form: per-frame stat outputs tripled the K=1
        # dispatch cost on-chip (probe_stepper probe D) — the scan-form
        # run above already reported the sparsity counters
        stepper = FrameStepper(net, params, thresholds=taus,
                               collect_stats=False)
        n = (clip.shape[0] // K) * K
        # Warm BOTH executables untimed: frame/chunk 0 exercises only the
        # refresh/cold executable, so without a plain warm call the plain
        # step would trace+compile inside the timed window (advisor r4).
        # On clips too short for two warm units, keep one timed unit and
        # accept the compile in-window (toy/CI shapes only).
        if K == 1:
            warm_n = min(2, max(1, n - 1))
            for t in range(warm_n):
                y, _ = stepper(clip[t])
            sync(y)
            t0 = time.perf_counter()
            for t in range(warm_n, n):
                y, _ = stepper(clip[t])
            sync(y)
            timed = n - warm_n
        else:
            warm_c = min(2, max(1, n // K - 1))
            for c in range(warm_c):
                ys_l, _ = stepper.step_chunk(clip[c * K:(c + 1) * K])
            sync(ys_l)
            t0 = time.perf_counter()
            for c in range(warm_c, n // K):
                ys_l, _ = stepper.step_chunk(clip[c * K:(c + 1) * K])
            sync(ys_l)
            timed = n - warm_c * K
        if timed > 0:
            out["live_ms_per_frame"] = round(
                (time.perf_counter() - t0) * 1e3 / timed, 3)
            out["live_chunk"] = K
    print(json.dumps(out))
    if not args.json:
        print(summarize_stats(jax.device_get(stats), net.specs))


if __name__ == "__main__":
    sys.exit(main())
