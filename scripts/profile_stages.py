"""Per-layer / per-stage wall-clock attribution on the real chip (C20).

The reference papers report per-stage timing breakdowns (arXiv 1704.04313
§4); this script produces the TPU equivalent and writes PROFILE.json. Two
views:

1. **Layer-prefix deltas**: time the CB scan (and the dense path) over
   net prefixes specs[:k]; layer k's cost = t(k) - t(k-1). Captures
   everything a layer adds: detect, compact glue, kernel, hint plumbing.
2. **Stage isolation (detect-only)**: a variant pipeline whose conv/pool
   tile_fn is an identity write-back skips the gather/GEMM/scatter, so
   (full - detect_only) ~ compute stage, detect_only ~ detect + glue.

Methodology matches bench.py: frame loop inside one jitted scan, fresh
frames per dispatch, device-resident clips, scalar-fetch sync, measured
sync overhead subtracted.
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


def measure(step, chunks, carry, sync_overhead, reps=1):
    """Time ``step(chunk, carry) -> (sync_arr, carry)`` over the chunks.

    The carry (CB state) is donated inside step, so it must be re-threaded
    between calls; returns (best seconds per chunk-sweep, final carry).
    reps defaults to 1: a second carry-less (dense) rep would repeat
    identical dispatches, which the runtime memoizes.
    """
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        s = None
        for ch in chunks:
            s, carry = step(ch, carry)
        _ = float(s[0])
        best = min(best, time.perf_counter() - t0 - sync_overhead)
    return best, carry


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--chunks", type=int, default=2)
    ap.add_argument("--model", default="scene")
    ap.add_argument("--width-mult", type=int, default=128)
    ap.add_argument("--out", default="/root/repo/PROFILE.json")
    args = ap.parse_args(argv)

    from cbinfer_tpu.config import PipelineConfig, TileConfig
    from cbinfer_tpu.convert import convert, num_cb_layers
    from cbinfer_tpu.models import get_model
    from cbinfer_tpu.runner import scan_video
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig
    import bench as _bench  # weight/threshold loaders (repo root on path)

    H, W, T = args.height, args.width, args.frames
    from cbinfer_tpu.benchmark import devices_or_die  # bounded: tunnel can hang
    on_tpu = any(d.platform == "tpu" for d in devices_or_die())
    backend = "pallas" if on_tpu else "jnp"
    specs = get_model(args.model, num_classes=8, width=args.width_mult)
    cfg = PipelineConfig(
        tile=TileConfig(tile_h=8, tile_w=8, capacity_fraction=0.375),
        backend=backend,
        compute_dtype="bfloat16" if on_tpu else "float32",
        cache_dtype="bfloat16" if on_tpu else "float32")
    params, weights_src = _bench._load_params(specs, (H, W, 3))

    video = SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=4, sprite_size=48, speed=4.0,
        noise_std=0.002, seed=0))
    chunks = [jnp.asarray(video.clip(T)) for _ in range(args.chunks)]
    for ch in chunks:
        _ = float(jnp.sum(ch))

    sync = jax.jit(lambda a: jnp.sum(a) * 0 + 1.0)
    _ = float(sync(jnp.ones((8, 128))))
    t0 = time.perf_counter()
    for _ in range(3):
        _ = float(sync(jnp.ones((8, 128))))
    sync_overhead = (time.perf_counter() - t0) / 3

    frames_total = args.chunks * T
    rows = []
    prev_cb = prev_dense = 0.0
    # flagship config (bench.py parity): dense_cached stem + dense 1x1
    # classifier + tuned taus. Prefixes apply only the layer policies whose
    # index falls inside the prefix.
    from cbinfer_tpu.convert import flagship_layers
    overrides_full, dense_full = flagship_layers(specs, (H, W, 3), cfg)
    flag_net = convert(specs, (H, W, 3), cfg, dense_layers=dense_full,
                       backend_overrides=overrides_full)
    taus_full, refresh, tau_src = _bench._load_thresholds(
        num_cb_layers(flag_net.specs))
    for k in range(1, len(specs) + 1):
        sub = flag_net.specs[:k]
        net = convert(sub, (H, W, 3), cfg,
                      thresholds=taus_full[:num_cb_layers(sub)])
        p = params[:k]

        # Wide-prefix outputs are huge (stem: 720x1280x128 x T frames) —
        # neither path may STACK per-frame outputs. Scans emit only one
        # row-slice sum per frame; the last value is the sync scalar.
        def cb_body(pp, fs, st, _n=net):
            def step(carry, x):
                y, st2, _ = _n.apply(pp, carry, x)
                y = y.data if hasattr(y, "data") else y
                return st2, jnp.sum(y[-1, :, 0].astype(jnp.float32))
            st2, s = jax.lax.scan(step, st, fs)
            return s[-1].reshape(1), st2

        cb = jax.jit(cb_body, donate_argnums=(2,))
        s, st = cb(p, chunks[0], net.init_state())
        _ = float(s[0])
        t_cb, _st = measure(lambda ch, c: cb(p, ch, c), chunks, st,
                            sync_overhead)

        def dn_body(pp, fs, _n=net):
            def step(carry, x):
                y = _n.apply_dense(pp, x)
                return carry, jnp.sum(y[-1, :, 0].astype(jnp.float32))
            _, s = jax.lax.scan(step, 0, fs)
            return s[-1].reshape(1)

        dn = jax.jit(dn_body)
        d = dn(p, chunks[0])
        _ = float(d[0])
        t_dense, _ = measure(lambda ch, c: (dn(p, ch), c), chunks, None,
                             sync_overhead)

        rows.append({
            "k": k, "layer": type(specs[k - 1]).__name__,
            "spec": str(specs[k - 1]),
            "cb_ms_total": 1e3 * t_cb / frames_total,
            "dense_ms_total": 1e3 * t_dense / frames_total,
            "cb_ms_layer": 1e3 * (t_cb - prev_cb) / frames_total,
            "dense_ms_layer": 1e3 * (t_dense - prev_dense) / frames_total,
        })
        prev_cb, prev_dense = t_cb, t_dense
        print(f"prefix {k:2d} {rows[-1]['layer']:<12} "
              f"cb {rows[-1]['cb_ms_layer']:6.3f} ms  "
              f"dense {rows[-1]['dense_ms_layer']:6.3f} ms  "
              f"(totals {rows[-1]['cb_ms_total']:6.3f} / "
              f"{rows[-1]['dense_ms_total']:6.3f})", flush=True)

    out = {
        "shape": [H, W], "frames": frames_total, "model": args.model,
        "weights": weights_src, "backend": backend,
        "stem": overrides_full.get(0, "cb"), "tau_source": tau_src,
        "thresholds": [round(float(t), 4) for t in taus_full],
        "sync_overhead_ms": 1e3 * sync_overhead,
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    sys.exit(main())
