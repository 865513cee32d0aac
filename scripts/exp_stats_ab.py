"""Same-process interleaved A/B: observability + ingest forms of the
timed CB scan (scene flagship, 720p).

The r4 stepper probe's plain scan (collect_stats=False, classic
per-frame xs) ran ~0.45 ms/frame where the shipped headline form
(collect_stats="mean", ingest=True) runs ~0.59 — if the carry-resident
stat accumulators or the ingest form cost real time, the headline is
leaving throughput on the table. Arms (all bit-identical outputs):

  mean+ingest    the shipped bench.py form
  none+ingest    stats dropped, clip-resident ingest kept
  mean+classic   stats kept, classic per-frame frame slicing
  none+classic   both off (the stepper probe's form)

Methodology: EXP_tau_ab rules — every arm compiled in ONE process,
timed over the SAME device-resident chunks, interleaved reps, medians.
Stats are observability, not deployment output: dropping them from the
TIMED window is fair iff the FLOP pillar is measured in a separate
(untimed) pass, which bench.py's accuracy pass already is.

Usage: python scripts/exp_stats_ab.py [model] [reps]
Merges a per-model section into EXP_stats_ab.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_enable_compilation_cache", False)

    from cbinfer_tpu import zoo
    from cbinfer_tpu.benchmark import devices_or_die, measure_sync_overhead
    from cbinfer_tpu.runner import scan_video
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig

    name = sys.argv[1] if len(sys.argv) > 1 else "scene"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    H, W, CHUNKS = 720, 1280, 6
    T = 12 if name.startswith("pose") else 32
    if not any(d.platform == "tpu" for d in devices_or_die()):
        print(json.dumps({"error": "not on TPU"}))
        return 1
    sync_overhead = measure_sync_overhead()

    wl = zoo.load(name, (H, W, 3))
    tv = jnp.asarray(wl.taus, jnp.float32)
    out_u8 = (None if name.startswith("pose")
              else (lambda y: jnp.argmax(y, -1).astype(jnp.uint8)))

    run_seed = int(time.time() * 1e3) % 100000
    video = SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=4, sprite_size=48, speed=4.0,
        noise_std=0.002, distinct_classes=name.startswith("pose"),
        seed=run_seed))
    chunks = [jnp.asarray(video.clip(T)) for _ in range(CHUNKS)]
    for ch in chunks:
        _ = float(jnp.sum(ch))

    def make(stats, ingest):
        fr = jax.jit(
            lambda p, fs, st: scan_video(wl.net, p, fs, state=st,
                                         thresholds=tv, refresh_start=True,
                                         out_map=out_u8,
                                         collect_stats=stats,
                                         ingest=ingest)[:2],
            donate_argnums=(2,))
        fp = jax.jit(
            lambda p, fs, st: scan_video(wl.net, p, fs, state=st,
                                         thresholds=tv, out_map=out_u8,
                                         collect_stats=stats,
                                         ingest=ingest)[:2],
            donate_argnums=(2,))
        return fr, fp

    arms = {
        "mean+ingest": make("mean", True),
        "none+ingest": make(False, True),
        "mean+classic": make("mean", False),
        "none+classic": make(False, False),
    }
    for fr, fp in arms.values():
        ys, st = fr(wl.params, chunks[0], wl.net.init_state())
        _ = float(jnp.sum(ys[-1]))
        ys, st = fp(wl.params, chunks[1], st)
        _ = float(jnp.sum(ys[-1]))

    times = {k: [] for k in arms}
    for r in range(reps):
        for k, (fr, fp) in arms.items():
            st = wl.net.init_state()
            ys, st = fr(wl.params, chunks[0], st)
            _ = float(jnp.sum(ys[-1]))  # warm state, untimed
            t0 = time.perf_counter()
            for ch in chunks[1:]:
                ys, st = fp(wl.params, ch, st)
            _ = float(jnp.sum(ys[-1]))
            times[k].append(time.perf_counter() - t0 - sync_overhead)

    n_frames = (CHUNKS - 1) * T
    med = {k: float(np.median(v)) for k, v in times.items()}
    base = med["mean+ingest"]
    row = {
        "model": name, "reps": reps, "seed": run_seed,
        "ms_per_frame": {k: round(1e3 * m / n_frames, 4)
                         for k, m in med.items()},
        "speedup_vs_shipped": {k: round(base / m, 4)
                               for k, m in med.items()},
        "all_s": {k: [round(x, 4) for x in v] for k, v in times.items()},
    }
    print(json.dumps(row), flush=True)
    path = "/root/repo/EXP_stats_ab.json"
    out = {"experiment": __doc__.split("\n")[0], "models": {}}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        out["models"] = prev.get("models", {})
        if "ms_per_frame" in prev:  # first-version single-model layout
            out["models"]["scene"] = {k: prev[k] for k in
                                      ("reps", "seed", "ms_per_frame",
                                       "speedup_vs_shipped", "all_s")
                                      if k in prev}
    out["models"][name] = row
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
