"""Long-horizon streaming run (SURVEY.md §5.7): 2048 frames, one stream.

The framework's "long-context" story is temporal: O(1) memory in video
length via the donated scan carry, bounded cache drift via the validated
refresh cadence. The per-round benches time ~256-frame windows; this
runs a 64-chunk (2048-frame) continuous stream on-chip and reports

  * per-window throughput (8-chunk windows) — a leak or fragmentation
    problem would show as drift across windows,
  * ground-truth mIoU per window for CB and dense — accumulated-drift
    degradation would grow with time; the refresh policy should pin it,
  * the worst window's degradation vs the 0.5% budget.

Chunks are generated on the host between windows (staging 64 distinct
720p chunks at once would be ~22 GB); generation and transfer happen
OUTSIDE the timed spans. Writes LONGRUN.json.

Usage: python scripts/bench_longrun.py [chunks=64]
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


def main():
    from cbinfer_tpu import zoo
    from cbinfer_tpu.benchmark import devices_or_die, measure_sync_overhead
    from cbinfer_tpu.metrics import iu_maps_device, merge_iu
    from cbinfer_tpu.network import out_shapes
    from cbinfer_tpu.runner import scan_video
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig

    CHUNKS = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    H, W, T, NC = 720, 1280, 32, 8
    WIN = 8  # chunks per reporting window = one refresh period
    if not any(d.platform == "tpu" for d in devices_or_die()):
        print(json.dumps({"error": "not on TPU"}))
        return 1
    sync_ms = measure_sync_overhead() * 1e3

    wl = zoo.load("scene", (H, W, 3))
    tv = jnp.asarray(wl.taus, jnp.float32)
    cadence, _src = zoo.load_refresh_cadence("scene", T, H, W)
    out_u8 = lambda y: jnp.argmax(y, -1).astype(jnp.uint8)  # noqa: E731
    stride = H // out_shapes(wl.net.specs, (H, W, 3))[-1][0]

    def mk(refresh):
        return jax.jit(
            lambda p, fs, st: scan_video(wl.net, p, fs, state=st,
                                         thresholds=tv,
                                         refresh_start=refresh,
                                         out_map=out_u8,
                                         collect_stats=False)[:2],
            donate_argnums=(2,))

    fr, fp = mk(True), mk(False)
    dense = jax.jit(lambda p, fs: jax.lax.map(
        lambda x: out_u8(wl.net.apply_dense(p, x)), fs))
    iu = jax.jit(lambda a, l: iu_maps_device(a, l, NC))

    video = SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=4, sprite_size=48, speed=4.0,
        noise_std=0.002, seed=424242))

    # warm/compile on a throwaway chunk
    warm = jnp.asarray(video.clip(T))
    ys, st = fr(wl.params, warm, wl.net.init_state())
    _ = float(jnp.sum(ys[-1]))
    ys, st = fp(wl.params, warm, st)
    _ = float(jnp.sum(ys[-1]))
    d = dense(wl.params, warm)
    _ = float(jnp.sum(d[-1]))

    st = wl.net.init_state()
    windows = []
    first = True
    for w0 in range(0, CHUNKS, WIN):
        # host-side generation + staging, untimed
        staged = []
        for i in range(w0, min(w0 + WIN, CHUNKS)):
            f, l = video.clip_with_labels(T)
            staged.append((jnp.asarray(f),
                           jnp.asarray(l[:, ::stride, ::stride])))
        for f, l in staged:
            _ = float(jnp.sum(f[0, 0, 0]))
        # timed CB pass over the window (refresh prolog on chunk 0 of
        # each cadence period, exactly the deployment policy)
        outs = []
        t0 = time.perf_counter()
        for j, (f, _l) in enumerate(staged):
            i = w0 + j
            fn = fr if (i % cadence == 0 or first) else fp
            first = False
            ys, st = fn(wl.params, f, st)
            outs.append(ys)
        _ = float(jnp.sum(ys[-1]))
        cb_fps = len(staged) * T / max(
            1e-9, time.perf_counter() - t0 - sync_ms / 1e3)
        # accuracy, untimed: GT iu for CB and dense over the window
        s_cb = (np.zeros((NC,), np.int64), np.zeros((NC,), np.int64))
        s_dn = (np.zeros((NC,), np.int64), np.zeros((NC,), np.int64))
        for (f, l), ys in zip(staged, outs):
            dn = dense(wl.params, f)
            a, b = iu(ys, l)
            s_cb = (s_cb[0] + np.asarray(a, np.int64),
                    s_cb[1] + np.asarray(b, np.int64))
            a, b = iu(dn, l)
            s_dn = (s_dn[0] + np.asarray(a, np.int64),
                    s_dn[1] + np.asarray(b, np.int64))
        m_cb, m_dn = merge_iu(*s_cb), merge_iu(*s_dn)
        row = {"window_chunks": [w0, min(w0 + WIN, CHUNKS)],
               "frames": [w0 * T, min(w0 + WIN, CHUNKS) * T],
               "cb_fps": round(cb_fps, 1),
               "miou_gt_cb": round(m_cb, 5),
               "miou_gt_dense": round(m_dn, 5),
               "degradation": round(m_dn - m_cb, 5)}
        windows.append(row)
        print(json.dumps(row), flush=True)

    fps = [w["cb_fps"] for w in windows]
    degs = [w["degradation"] for w in windows]
    out = {
        "model": "scene", "resolution": f"{H}x{W}",
        "horizon_frames": CHUNKS * T, "refresh_cadence_chunks": cadence,
        "fps_first_window": fps[0], "fps_last_window": fps[-1],
        "fps_min": min(fps), "fps_max": max(fps),
        "fps_drift_last_vs_first": round(fps[-1] / fps[0], 4),
        "worst_window_degradation": round(max(degs), 5),
        "mean_degradation": round(float(np.mean(degs)), 6),
        "windows": windows,
        "note": ("continuous single-stream run, donated carry, refresh "
                 "prolog at the validated cadence; per-window GT mIoU "
                 "for both paths — drift/leak would show as fps or "
                 "degradation trending across windows (SURVEY.md §5.7)"),
    }
    with open("/root/repo/LONGRUN.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "windows"}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
