"""Controlled tau A/B: does flat tau=0.02 really outrun tuned 0.15x6?

The r3 same-session eval measured the scene flagship FASTER at flat
tau=0.02 (926.8 fps) than at the tuned uniform 0.15 (878.4 fps) despite
computing MORE (flop_reduction 17.6x vs 18.3x) under the identical
refresh policy. Two candidate explanations:

  (a) measurement order/warmth artifact (rows are separate jit programs
      compiled in sequence);
  (b) a real effect of the accepted-cache rule: at large tau,
      sub-threshold drift accumulates until it crosses tau, so steady
      state re-triggers pixels in more, scattered places (worse DMA
      locality per dirty tile), while a small tau tracks the input
      closely and each frame's mask is just the fresh motion.

This experiment removes (a): thresholds are RUNTIME scalars, so ONE
compiled scan program runs all vectors, interleaved A/B/A/B over
identical chunks, best-of-N per vector, with per-layer changed-tile
counts recorded from the stats channel. Writes EXP_tau_ab.json.

Usage: python scripts/exp_tau_ab.py [model] [T] [reps]
"""

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

from cbinfer_tpu import zoo
from cbinfer_tpu.runner import scan_video
from cbinfer_tpu.video import (SpriteVideo, SpriteVideoConfig,
                               workload_video_kwargs)

H, W, CHUNKS = 720, 1280, 4


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "scene"
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    wl = zoo.load(name, (H, W, 3))
    net, params = wl.net, wl.params
    n = len(wl.taus)
    vectors = {"tuned": list(wl.taus)}
    for t in (0.07, 0.045, 0.02, 0.01):
        vectors[f"flat{t}"] = [t] * n

    video = SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=4, sprite_size=48, speed=4.0,
        noise_std=0.002, seed=5,
        distinct_classes=name.startswith("pose"),
        **workload_video_kwargs(name)))
    chunks = [jnp.asarray(video.clip(T)) for _ in range(CHUNKS)]
    for ch in chunks:
        _ = float(jnp.sum(ch))

    from cbinfer_tpu.benchmark import measure_sync_overhead
    sync = measure_sync_overhead()

    # ONE program: thresholds are a runtime argument. collect_stats=False
    # for the timed path; a stats twin runs once per vector (untimed).
    cb = jax.jit(lambda p, fs, st, tv: scan_video(
        net, p, fs, state=st, thresholds=tv, collect_stats=False)[:2],
        donate_argnums=(2,))
    cb_stats = jax.jit(lambda p, fs, st, tv: scan_video(
        net, p, fs, state=st, thresholds=tv)[1:3],
        donate_argnums=(2,))

    results = {}
    for vname, tv in vectors.items():
        results[vname] = {"thresholds": tv, "times_s": []}

    # warm both programs + reach steady state once per vector
    for vname, tv in vectors.items():
        tvj = jnp.asarray(tv, jnp.float32)
        st = net.init_state()
        ys, st = cb(params, chunks[0], st, tvj)
        _ = float(jnp.sum(jax.tree.leaves(ys)[0][-1]))
        st, stats = cb_stats(params, chunks[1], st, tvj)
        stats = jax.device_get(stats)
        # dense_cached layers emit an empty stats entry — skip them
        ct = {k: float(np.mean(np.asarray(v["changed_tiles"], np.float64)))
              for k, v in enumerate(stats)
              if isinstance(v, dict) and "changed_tiles" in v} \
            if isinstance(stats, list) else None
        results[vname]["mean_changed_tiles_per_layer"] = ct

    # interleaved timed passes: vector order rotates so no vector always
    # runs first-after-anything
    order = list(vectors)
    for rep in range(reps):
        for vname in order[rep % len(order):] + order[:rep % len(order)]:
            tvj = jnp.asarray(vectors[vname], jnp.float32)
            st = net.init_state()
            ys, st = cb(params, chunks[0], st, tvj)  # cold start, untimed
            _ = float(jnp.sum(jax.tree.leaves(ys)[0][-1]))
            t0 = time.perf_counter()
            for ch in chunks[1:]:
                ys, st = cb(params, ch, st, tvj)
            _ = float(jnp.sum(jax.tree.leaves(ys)[0][-1]))
            dt = time.perf_counter() - t0 - sync
            results[vname]["times_s"].append(dt)
            fps = (CHUNKS - 1) * T / dt
            print(f"rep{rep} {vname:<10} {dt*1e3/((CHUNKS-1)*T):7.3f} "
                  f"ms/frame ({fps:7.1f} fps)", flush=True)

    out = {"model": name, "H": H, "W": W, "T": T, "chunks": CHUNKS,
           "reps": reps, "rows": []}
    for vname, r in results.items():
        best = min(r["times_s"])
        out["rows"].append({
            "taus": vname, "thresholds": r["thresholds"],
            "best_fps": round((CHUNKS - 1) * T / best, 1),
            "all_fps": [round((CHUNKS - 1) * T / t, 1)
                        for t in r["times_s"]],
            "mean_changed_tiles_per_layer":
                r.get("mean_changed_tiles_per_layer"),
        })
    with open("/root/repo/EXP_tau_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    print("written EXP_tau_ab.json")


if __name__ == "__main__":
    main()
