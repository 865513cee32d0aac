"""Single-frame deployment latency (FrameStepper) per workload.

The reference's deployment story is real-time per-frame inference on an
embedded GPU (CB17 §4 / CB19 §VI report per-frame throughput, not batch
throughput). scan_video amortizes dispatch over T frames; a live camera
cannot. This measures the FrameStepper path: one host->device dispatch
per frame, donated caches, steady state after a dense cold start,
refresh frames at the validated cadence interleaved exactly as deployed.

Reported per model:
  dense_ms_pipelined  the SAME per-frame dispatch protocol on the dense
              path (one jitted dense forward per frame, no carry) — the
              live-mode baseline the reference actually published
              against (CB17 §4 per-frame on-device throughput);
              live_speedup_vs_dense = dense/CB per-frame device time.
  wall_ms     p50/p95 of per-frame wall time as a live caller sees it
              (includes this box's host<->device tunnel RTT, itself
              reported as sync_overhead_ms — on-prem serving would not
              pay a tunnel; the per-frame device time is far below that
              RTT, so wall p50 here is effectively the tunnel),
  device_ms_pipelined  per-frame device latency measured honestly: K
              sequential one-frame dispatches enqueued back-to-back
              (each still a separate executable launch, serialized on
              device by the donated-cache dependency), ONE sync at the
              end — the tunnel RTT is paid once per window instead of
              once per frame. Median over windows of (window−sync)/K.
  refresh_ms  p50 of directly-timed dense-refresh dispatches (the
              latency spike a deployment must budget for every
              `refresh_interval_frames` frames),
  scan_ms     the amortized scan_video ms/frame from RESULTS.json for
              contrast (batch-throughput form; same executables, T-frame
              scan instead of per-frame dispatch).

Writes LATENCY.json. Usage: python scripts/bench_latency.py [model ...]
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
from cbinfer_tpu.benchmark import measure_sync_overhead
from cbinfer_tpu.runner import FrameStepper
from cbinfer_tpu.video import (SpriteVideo, SpriteVideoConfig,
                               workload_video_kwargs)

H, W = 720, 1280
FRAMES = 96          # timed frames (after cold start + warmup)
WARM = 8
PIPE_K = 64          # frames per pipelined device-latency window: at
# ~0.6 ms/frame the window must drown the tunnel's ±15 ms RTT jitter
# (32-frame windows = ~20 ms device time carried ±0.5 ms/frame of
# jitter into the median; 64 halves it, and every refresh interval in
# REFRESH_*.json is > 64 so windows still fit between refreshes)
PIPE_WINDOWS = 7
REFRESH_SAMPLES = 5


def _scan_ms(name):
    """Amortized scan_video ms/frame from RESULTS.json (contrast row)."""
    try:
        with open("/root/repo/RESULTS.json") as f:
            rows = json.load(f).get("rows", [])
        for r in rows:
            if r.get("model") == name and r.get("cb_fps"):
                return round(1000.0 / float(r["cb_fps"]), 3)
    except Exception:
        pass
    return None


def bench(name, sync_ms):
    wl = zoo.load(name, (H, W, 3))
    cadence, _src = zoo.load_refresh_cadence(
        name, 12 if name.startswith("pose") else 32, H, W)
    interval = cadence * (12 if name.startswith("pose") else 32)
    out_map = None
    if wl.metric == "miou":
        out_map = lambda y: jnp.argmax(y, axis=-1).astype(jnp.uint8)
    # deployment live form: no per-frame stats. The r4 stepper returned
    # ~6 scalar stat buffers per CB layer per dispatch; probe_stepper
    # probe D measured that at 720p scene those outputs alone tripled
    # the K=1 dispatch cost (1.99 -> 0.54 ms/frame without them).
    stepper = FrameStepper(wl.net, wl.params, thresholds=wl.taus,
                           refresh_every=interval, out_map=out_map,
                           collect_stats=False)
    video = SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=4, sprite_size=48, speed=4.0,
        noise_std=0.002, seed=17,
        distinct_classes=name.startswith("pose"),
        **workload_video_kwargs(name)))
    # pre-stage every frame on device: a live source hands over frames
    # that already exist; we measure inference latency, not generation
    frames = [jnp.asarray(f) for f in video.clip(WARM + FRAMES)]
    for f in frames:
        _ = float(jnp.sum(f))

    def sync(arr):
        # scalar fetch, not block_until_ready (bench.py timing notes:
        # block_until_ready can return early on this runtime)
        return float(jnp.max(jnp.asarray(arr, jnp.float32).ravel()[:1]))

    # cold start + warmup (compiles both executables)
    for t in range(WARM):
        y, _ = stepper(frames[t])
    sync(y)

    # (a) live-caller wall time: one blocking dispatch per frame
    wall = []
    for t in range(WARM, WARM + FRAMES):
        if (stepper._t % interval) == 0:   # keep the wall sample steady-state
            y, _ = stepper(frames[t])
            sync(y)
            continue
        t0 = time.perf_counter()
        y, _ = stepper(frames[t])
        sync(y)
        wall.append((time.perf_counter() - t0) * 1e3)

    # (b) pipelined device latency: K async one-frame dispatches, one sync.
    # The donated-cache dependency serializes them on device; the tunnel
    # RTT is paid once per window. Skip past any refresh boundary so the
    # window is pure steady state.
    pipe = []
    fi = 0
    for _ in range(PIPE_WINDOWS):
        if (stepper._t % interval) + PIPE_K >= interval:
            y, _ = stepper(frames[fi % len(frames)])  # absorb the refresh
            sync(y)
            fi += 1
        t0 = time.perf_counter()
        for _ in range(PIPE_K):
            y, _ = stepper(frames[fi % len(frames)])
            fi += 1
        sync(y)
        win_ms = (time.perf_counter() - t0) * 1e3
        pipe.append(max(0.0, win_ms - sync_ms) / PIPE_K)

    # (a2) dense per-frame baseline: the same dispatch protocol on the
    # dense path — one jitted dense forward per frame, no carry. This is
    # the number the reference's per-frame speedup claims divide by.
    dense1 = jax.jit(lambda p, x: (out_map or (lambda v: v))(
        wl.net.apply_dense(p, x)))
    d = dense1(wl.params, frames[0])
    sync(d)
    dpipe = []
    fi = 0
    for _ in range(PIPE_WINDOWS):
        t0 = time.perf_counter()
        for _ in range(PIPE_K // 4):     # dense is ~5-10x slower; shorter
            d = dense1(wl.params, frames[fi % len(frames)])
            fi += 1
        sync(d)
        win_ms = (time.perf_counter() - t0) * 1e3
        dpipe.append(max(0.0, win_ms - sync_ms) / (PIPE_K // 4))

    # (b2) micro-batch live mode (FrameStepper.step_chunk): one dispatch
    # per K consecutive frames, refresh prolog at chunk granularity — the
    # deployment latency/throughput dial (K-1 frames of capture latency
    # buys per-dispatch-overhead/K). K-chunks pre-stacked and device-
    # resident before timing (host stacks of 720p frames inside a timed
    # loop cost ~10 ms/call through this tunnel — probe_stepper.py).
    micro = {}
    for K in (4, 8):
        mb = FrameStepper(wl.net, wl.params, thresholds=wl.taus,
                          refresh_every=interval, out_map=out_map,
                          collect_stats=False)
        # small cycled pool of pre-staged stacks (~(nwin+2)*K frames):
        # the donated state makes every dispatch's args unique, so
        # dispatch memoization cannot hit even when a stack repeats
        nwin = PIPE_K // K
        stacks = [jnp.stack([frames[(i * K + j) % len(frames)]
                             for j in range(K)])
                  for i in range(nwin + 2)]
        for s in stacks:
            _ = float(jnp.sum(s[0, 0, 0]))
        ys, _ = mb.step_chunk(stacks[0])  # cold start + compile refresh
        ys, _ = mb.step_chunk(stacks[1])  # compile plain
        sync(ys)
        si = 2
        vals = []
        for _ in range(PIPE_WINDOWS):
            if (mb._since_refresh + nwin * K) >= interval:
                ys, _ = mb.step_chunk(stacks[si % len(stacks)]); si += 1
                sync(ys)  # absorb the refresh, untimed
            t0 = time.perf_counter()
            for _ in range(nwin):
                ys, _ = mb.step_chunk(stacks[si % len(stacks)]); si += 1
            sync(ys)
            win_ms = (time.perf_counter() - t0) * 1e3
            vals.append(max(0.0, win_ms - sync_ms) / (nwin * K))
        micro[f"device_ms_chunk{K}"] = round(float(np.median(vals)), 3)

    # (c) refresh spike: time the dense-refresh executable directly (the
    # stepper runs it every `interval` frames; its cost is phase-free).
    refresh_wall = []
    for i in range(REFRESH_SAMPLES):
        x = frames[i % len(frames)]
        t0 = time.perf_counter()
        y, stepper._state, _ = stepper._cold(
            stepper._params, stepper._state, x, stepper._tv)
        sync(y)
        refresh_wall.append((time.perf_counter() - t0) * 1e3)

    wall = np.asarray(wall)
    row = {
        "model": name, "resolution": f"{H}x{W}",
        "frames": int(wall.size), "refresh_interval_frames": interval,
        "wall_ms_p50": round(float(np.percentile(wall, 50)), 3),
        "wall_ms_p95": round(float(np.percentile(wall, 95)), 3),
        "device_ms_pipelined": round(float(np.median(pipe)), 3),
        "dense_ms_pipelined": round(float(np.median(dpipe)), 3),
        "live_speedup_vs_dense": round(
            float(np.median(dpipe)) / float(np.median(pipe)), 2),
        "live_form": "collect_stats=False",
        **micro,
        "refresh_ms_p50": round(float(np.median(refresh_wall)), 3),
        "scan_ms_per_frame": _scan_ms(name),
        "weights": wl.weights, "tau_source": wl.tau_source,
        "output_form": "argmax_u8" if out_map is not None else "logits",
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    models = sys.argv[1:] or ["scene", "seg", "pose", "pose_graph"]
    sync_ms = measure_sync_overhead() * 1e3
    rows = [bench(m, sync_ms) for m in models]
    out = {"sync_overhead_ms": round(sync_ms, 3), "rows": rows,
           "note": ("Per-frame FrameStepper latency (one dispatch/frame, "
                    "donated caches, refresh at the validated cadence). "
                    "wall_ms includes the axon tunnel RTT (~sync_overhead_ms "
                    "per blocking call); device_ms_pipelined amortizes the "
                    "RTT over a window of async dispatches serialized on "
                    "device by the donated caches. device_ms_chunkK is the "
                    "micro-batch live mode (FrameStepper.step_chunk: one "
                    "dispatch per K frames, K-1 frames added capture "
                    "latency). refresh_ms_p50 times the dense-refresh "
                    "executable directly.")}
    with open("/root/repo/LATENCY.json", "w") as f:
        json.dump(out, f, indent=1)
    print("written LATENCY.json")


if __name__ == "__main__":
    main()
