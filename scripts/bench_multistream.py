"""Multi-stream throughput on one chip (SURVEY.md C14 / configs[4]).

Measures MultiStreamRunner (sequential one-stream-per-device WAVES, see
parallel/streams.py) against running the same S clips back-to-back
through the single-stream scan — frames/sec/chip is the unit either way.
On one chip the runner IS sequential per construction, so the ratio
should be ~1.0 minus per-wave dispatch overhead; the stacked-program
forms it replaced measured 0.35x (vmap, r2) and 0.37x (lax.map over a
stacked carry, r3).

Writes a "multistream" row into RESULTS.json. Honest-methodology rules
from cbinfer_tpu/benchmark.py apply (distinct chunks, scalar-fetch sync,
measured sync overhead subtracted, no host ops on big arrays while timed).

Usage: python scripts/bench_multistream.py [--streams 4] [--height 360]
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
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--chunks", type=int, default=2)
    args = ap.parse_args(argv)

    from cbinfer_tpu.benchmark import measure_sync_overhead, scalar_sync
    from cbinfer_tpu.config import PipelineConfig, TileConfig
    from cbinfer_tpu.convert import convert_flagship, num_cb_layers
    from cbinfer_tpu.models import get_model
    from cbinfer_tpu.parallel.streams import MultiStreamRunner
    from cbinfer_tpu.runner import scan_video
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig
    import bench as _bench

    H, W, T, S = args.height, args.width, args.frames, args.streams
    from cbinfer_tpu.benchmark import devices_or_die  # bounded: tunnel can hang
    on_tpu = any(d.platform == "tpu" for d in devices_or_die())
    specs = get_model("scene", num_classes=8, width=128)
    cfg = PipelineConfig(
        tile=TileConfig(8, 8, capacity_fraction=0.375),
        backend="pallas" if on_tpu else "jnp",
        compute_dtype="bfloat16" if on_tpu else "float32",
        cache_dtype="bfloat16" if on_tpu else "float32")
    net = convert_flagship(specs, (H, W, 3), cfg)
    params, weights_src = _bench._load_params(specs, (H, W, 3))
    taus, _refresh, tau_src = _bench._load_thresholds(
        num_cb_layers(net.specs))
    tau_vec = jnp.asarray(taus, jnp.float32)
    net = convert_flagship(specs, (H, W, 3), cfg,
                           thresholds=[float(t) for t in taus])

    # one clip generator per stream (disjoint seeds), per-run unique base
    # seed (dispatch memoization, see bench.py)
    base = int(time.time() * 1e3) % 100000
    videos = [SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=3, sprite_size=32, speed=4.0,
        noise_std=0.002, seed=base + s)) for s in range(S)]

    def stream_chunk():
        return np.stack([v.clip(T) for v in videos])  # (S, T, H, W, C)

    warm = jnp.asarray(stream_chunk())
    chunks = [jnp.asarray(stream_chunk()) for _ in range(args.chunks)]
    for c in chunks + [warm]:
        scalar_sync(c)
    sync_overhead = measure_sync_overhead()
    print(f"data staged ({S} streams x {args.chunks + 1} chunks), "
          f"sync_overhead={sync_overhead * 1e3:.1f} ms", flush=True)

    # --- sequential baseline: same frames, one stream at a time ---
    # deployment output form on BOTH paths (bench.py output_form doc):
    # stacking raw 8-ch bf16 logits over (S, T) pays a 16x lane-padded
    # write per stream that no class-map consumer reads; stats dropped
    # on both paths alike
    out_u8 = lambda y: jnp.argmax(y, -1).astype(jnp.uint8)  # noqa: E731
    cb = jax.jit(lambda p, fs, st: scan_video(net, p, fs, state=st,
                                              thresholds=tau_vec,
                                              out_map=out_u8,
                                              collect_stats=False)[:2],
                 donate_argnums=(2,))
    states = [None] * S
    for s in range(S):  # warm pass = compile + cold start per stream
        ys, states[s] = cb(params, warm[s], net.init_state())
    scalar_sync(ys)
    print("sequential baseline warm", flush=True)
    t0 = time.perf_counter()
    for ch in chunks:
        for s in range(S):
            ys, states[s] = cb(params, ch[s], states[s])
    scalar_sync(ys)
    seq_fps = (args.chunks * S * T
               / max(1e-9, time.perf_counter() - t0 - sync_overhead))

    # --- batched: one program, S streams ---
    print(f"sequential baseline: {seq_fps:.1f} fps", flush=True)
    runner = MultiStreamRunner(net, params, n_streams=S,
                               thresholds=tau_vec, out_map=out_u8,
                               collect_stats=False)
    ys, _ = runner.run_clip(warm)  # compile + cold start
    scalar_sync(ys)
    print("runner warm", flush=True)
    t0 = time.perf_counter()
    for ch in chunks:
        ys, _ = runner.run_clip(ch)
    scalar_sync(ys)
    batched_fps = (args.chunks * S * T
                   / max(1e-9, time.perf_counter() - t0 - sync_overhead))

    # --- batched, no output gather: identical OUTPUT FORM to the
    # sequential baseline (a list of per-stream arrays). The gathered
    # form above additionally stacks the (S, T, H, W) uint8 class maps
    # (~118 MB of copies per 4x32-frame chunk at 720p) — output
    # cosmetics the sequential loop never pays, and the r4-measured ~2%
    # wave deficit at 720p (VERDICT r4 weak #5).
    runner_ng = MultiStreamRunner(net, params, n_streams=S,
                                  thresholds=tau_vec, out_map=out_u8,
                                  collect_stats=False,
                                  gather_outputs=False)
    ys_l, _ = runner_ng.run_clip(warm)
    scalar_sync(ys_l[-1])
    t0 = time.perf_counter()
    for ch in chunks:
        ys_l, _ = runner_ng.run_clip(ch)
    scalar_sync(ys_l[-1])
    nogather_fps = (args.chunks * S * T
                    / max(1e-9, time.perf_counter() - t0 - sync_overhead))

    row = {
        "model": "scene", "mode": "multistream",
        "resolution": f"{H}x{W}", "streams": S,
        "weights": weights_src, "tau_source": tau_src,
        "sequential_fps_per_chip": round(seq_fps, 1),
        "batched_fps_per_chip": round(batched_fps, 1),
        "batched_vs_sequential": round(batched_fps / seq_fps, 3),
        "batched_nogather_fps_per_chip": round(nogather_fps, 1),
        "batched_nogather_vs_sequential": round(nogather_fps / seq_fps, 3),
        "devices": len(jax.devices()),
    }
    print(json.dumps(row), flush=True)
    out = "/root/repo/RESULTS.json"
    results = {"rows": []}
    if os.path.exists(out):
        with open(out) as f:
            results = json.load(f)
    results["rows"] = [r for r in results.get("rows", [])
                       if r.get("mode") != "multistream"] + [row]
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("updated RESULTS.json")


if __name__ == "__main__":
    sys.exit(main())
