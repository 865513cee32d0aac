"""Throughput vs change rate + the worst case (VERDICT r4 missing #3).

The reference's applicability boundary is the quasi-static camera
(CB17 §1): speedup scales inversely with the fraction of the frame that
changes, and a global camera motion voids the premise entirely. Every
prior artifact of this repo measured only the friendly regime
(4 sprites, overflow_frames 0). This sweep measures, at 720p on the
flagship scene network:

  * CB fps, overflow rate, effective-FLOP reduction, and agreement-mIoU
    vs dense at sprite-driven change rates from ~2% to ~40% of tiles,
  * the GLOBAL-PAN regime (SpriteVideoConfig.pan: the background scrolls
    every frame -> ~100% of tiles dirty -> the capacity-overflow dense
    fallback carries every frame), asserting CB degrades GRACEFULLY to
    ~dense throughput instead of falling off a cliff,
  * the measured break-even change rate (where CB fps crosses dense fps).

The dense baseline is measured in the same process, interleaved, so the
chip-state swing (±10%, RESULTS.md) cancels to first order.

Writes CHANGERATE.json. Usage: python scripts/bench_changerate.py [reps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cbinfer_tpu import zoo
from cbinfer_tpu.benchmark import devices_or_die, measure_sync_overhead
from cbinfer_tpu.metrics import miou_labels
from cbinfer_tpu.runner import scan_video
from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig

H, W, T, CHUNKS = 720, 1280, 32, 4

# sweep points: (label, video-config overrides)
POINTS = [
    ("sprites1",  dict(n_sprites=1,  sprite_size=48, speed=4.0)),
    ("sprites4",  dict(n_sprites=4,  sprite_size=48, speed=4.0)),   # bench pt
    ("sprites8",  dict(n_sprites=8,  sprite_size=48, speed=6.0)),
    ("sprites16", dict(n_sprites=16, sprite_size=64, speed=8.0)),
    ("sprites24", dict(n_sprites=24, sprite_size=80, speed=10.0)),
    ("pan_slow",  dict(n_sprites=4,  sprite_size=48, speed=4.0,
                       pan=(1.0, 2.0))),
    ("pan_fast",  dict(n_sprites=4,  sprite_size=48, speed=4.0,
                       pan=(4.0, 8.0))),
]


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    only = set(sys.argv[2:])          # point filter (tests run just pan_*;
    points = [p for p in POINTS       # filtered runs don't write the json)
              if not only or p[0] in only]
    if not any(d.platform == "tpu" for d in devices_or_die()):
        print(json.dumps({"error": "not on TPU"}))
        return 1
    sync_overhead = measure_sync_overhead()

    wl = zoo.load("scene", (H, W, 3))
    cadence, _ = zoo.load_refresh_cadence("scene", T, H, W)
    tv = jnp.asarray(wl.taus, jnp.float32)
    out_u8 = lambda y: jnp.argmax(y, -1).astype(jnp.uint8)  # noqa: E731

    fr = jax.jit(lambda p, fs, st: scan_video(
        wl.net, p, fs, state=st, thresholds=tv, refresh_start=True,
        out_map=out_u8, collect_stats="mean"), donate_argnums=(2,))
    fp = jax.jit(lambda p, fs, st: scan_video(
        wl.net, p, fs, state=st, thresholds=tv, out_map=out_u8,
        collect_stats="mean"), donate_argnums=(2,))
    dn = jax.jit(lambda p, fs: jax.lax.map(
        lambda x: out_u8(wl.net.apply_dense(p, x)), fs))

    run_seed = int(time.time() * 1e3) % 100000
    rows = []
    for label, over in points:
        video = SpriteVideo(SpriteVideoConfig(
            height=H, width=W, noise_std=0.002, seed=run_seed, **over))
        chunks = [jnp.asarray(video.clip(T)) for _ in range(CHUNKS)]
        for ch in chunks:
            _ = float(jnp.sum(ch))

        # warm both executables on this point's first chunk
        st = wl.net.init_state()
        ys, st, s0 = fr(wl.params, chunks[0], st)
        _ = float(jnp.sum(ys[-1]))
        ys, st, s0 = fp(wl.params, chunks[1], st)
        _ = float(jnp.sum(ys[-1]))
        d = dn(wl.params, chunks[0])
        _ = float(jnp.sum(d[-1]))

        cb_times, dn_times = [], []
        stats_mean = None
        cb_last = None
        for _ in range(reps):
            st = wl.net.init_state()
            ys, st, _s = fr(wl.params, chunks[0], st)
            _ = float(jnp.sum(ys[-1]))
            t0 = time.perf_counter()
            outs = []
            for i, ch in enumerate(chunks[1:], start=1):
                f = fr if cadence and (i % cadence) == 0 else fp
                ys, st, _s = f(wl.params, ch, st)
                outs.append(ys)
            _ = float(jnp.sum(outs[-1][-1]))
            cb_times.append(time.perf_counter() - t0 - sync_overhead)
            stats_mean = _s
            cb_last = outs

            t0 = time.perf_counter()
            douts = [dn(wl.params, ch) for ch in chunks[1:]]
            _ = float(jnp.sum(douts[-1][-1]))
            dn_times.append(time.perf_counter() - t0 - sync_overhead)

        n_timed = (CHUNKS - 1) * T
        cb_fps = n_timed / float(np.median(cb_times))
        dn_fps = n_timed / float(np.median(dn_times))
        agree = float(np.mean([
            miou_labels(np.asarray(a), np.asarray(b), 8)
            for a, b in zip(cb_last, douts)]))

        sm = jax.device_get(stats_mean)
        layer0 = next(s for s in sm if s)
        changed_frac = float(layer0["changed_tiles"] / layer0["n_tiles"])
        # worst layer's overflow rate (mean-form stats average the
        # per-frame overflow bool over the chunk)
        overflow_rate = float(max(float(s["overflow"])
                                  for s in sm if s))
        row = {
            "point": label, "config": {k: (list(v) if isinstance(v, tuple)
                                           else v) for k, v in over.items()},
            "changed_tile_frac_layer0": round(changed_frac, 4),
            "overflow_rate": round(overflow_rate, 4),
            "cb_fps": round(cb_fps, 1), "dense_fps": round(dn_fps, 1),
            "speedup": round(cb_fps / dn_fps, 3),
            "agreement_miou": round(agree, 5),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # break-even: linear interpolation of speedup over changed fraction
    pts = sorted((r["changed_tile_frac_layer0"], r["speedup"])
                 for r in rows)
    break_even = None
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        if (y0 - 1.0) * (y1 - 1.0) <= 0 and y0 != y1:
            break_even = x0 + (1.0 - y0) * (x1 - x0) / (y1 - y0)
            break
    out = {"model": "scene", "resolution": f"{H}x{W}",
           "chunks": CHUNKS, "frames_per_chunk": T, "reps": reps,
           "seed": run_seed,
           "refresh_cadence_chunks": cadence,
           "rows": rows,
           "break_even_changed_tile_frac": (round(break_even, 4)
                                            if break_even else None),
           "note": ("speedup = CB fps / dense fps measured interleaved "
                    "in-process. pan_* rows break the static-camera "
                    "premise: detection overflows capacity and the "
                    "lax.cond dense fallback carries the frame — the "
                    "graceful-degradation bound is speedup >= 0.9 there.")}
    if not only:
        with open("/root/repo/CHANGERATE.json", "w") as f:
            json.dump(out, f, indent=1)
        print("wrote CHANGERATE.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
