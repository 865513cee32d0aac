"""Root-cause the in-process sequencing degradation (VERDICT r4 weak #4).

r4 measured that a 720p workload benched AFTER another model in the same
process can run at HALF its standalone CB throughput (seg 2.16x-vs-dense
after scene vs 5.8x standalone), and worked around it with one-subprocess-
per-workload everywhere — correct hygiene, mechanism unknown. This probe
reproduces the effect minimally and bisects it: each ARM is a fresh
subprocess that runs phase A (a polluter), applies one candidate
mitigation, then measures phase B (seg CB scan) — so B's throughput vs
the "none" polluter arm isolates the mechanism.

Arms:
  alone          no phase A: B's standalone number (the reference)
  scene_cb       A = scene 720p CB scan (the r4 repro)
  scene_cb+clear A = scene CB, then jax.clear_caches()
  scene_cb+del   A = scene CB, then drop ALL A arrays + gc.collect()
                 (forces PJRT buffer frees -> tests allocator-state/
                 fragmentation: if freeing A's HBM restores B, the
                 mechanism is memory layout, not compiled-code state)
  scene_dense    A = scene 720p dense only (no Pallas kernels, no donated
                 caches -> tests whether CB-specific state matters)
  seg_cb         A = seg itself (same buffers/executables as B -> tests
                 whether ANY prior on-chip work degrades, or specifically
                 a DIFFERENT model's)
  scene_360p     A = scene at 360p (quarter the cache footprint ->
                 size-dependence)

Each arm reports B's cb ms/frame + HBM live-buffer stats before B.
Writes INPROCESS.json. Usage:
  python scripts/probe_inprocess.py            # driver: all arms
  python scripts/probe_inprocess.py --arm X    # one arm (subprocess mode)
"""

import gc
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = ("alone", "scene_cb", "scene_cb+clear", "scene_cb+del",
        "scene_dense", "seg_cb", "scene_360p")
H, W, T, CHUNKS, REPS = 720, 1280, 32, 3, 3


def _measure_cb(wl, chunks, reps, sync_overhead):
    """Median CB ms/frame over reps of a chunked refresh-prolog scan."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from cbinfer_tpu.runner import scan_video
    tv = jnp.asarray(wl.taus, jnp.float32)
    out_u8 = (lambda y: jnp.argmax(y, -1).astype(jnp.uint8))
    fr = jax.jit(lambda p, fs, st: scan_video(
        wl.net, p, fs, state=st, thresholds=tv, refresh_start=True,
        out_map=out_u8, collect_stats=False)[:2], donate_argnums=(2,))
    fp = jax.jit(lambda p, fs, st: scan_video(
        wl.net, p, fs, state=st, thresholds=tv, out_map=out_u8,
        collect_stats=False)[:2], donate_argnums=(2,))
    st = wl.net.init_state()
    ys, st = fr(wl.params, chunks[0], st)
    _ = float(jnp.sum(ys[-1]))
    ys, st = fp(wl.params, chunks[1], st)
    _ = float(jnp.sum(ys[-1]))
    times = []
    for _r in range(reps):
        st = wl.net.init_state()
        ys, st = fr(wl.params, chunks[0], st)
        _ = float(jnp.sum(ys[-1]))
        t0 = time.perf_counter()
        for ch in chunks[1:]:
            ys, st = fp(wl.params, ch, st)
        _ = float(jnp.sum(ys[-1]))
        times.append(time.perf_counter() - t0 - sync_overhead)
    n = (len(chunks) - 1) * T
    return float(np.median(times)) * 1e3 / n, (fr, fp)


def _hbm_stats():
    import jax
    try:
        bufs = jax.live_arrays()
        return {"live_arrays": len(bufs),
                "live_mb": round(sum(
                    b.size * b.dtype.itemsize for b in bufs) / 1e6, 1)}
    except Exception as exc:
        return {"live_arrays_error": str(exc)}


def run_arm(arm):
    import numpy as np  # noqa: F401
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from cbinfer_tpu import zoo
    from cbinfer_tpu.benchmark import devices_or_die, measure_sync_overhead
    from cbinfer_tpu.video import (SpriteVideo, SpriteVideoConfig,
                                   workload_video_kwargs)
    assert any(d.platform == "tpu" for d in devices_or_die())
    sync_overhead = measure_sync_overhead()

    def clips(name, h, w, n):
        vk = workload_video_kwargs(name)
        v = SpriteVideo(SpriteVideoConfig(
            height=h, width=w, n_sprites=4, sprite_size=max(24, h // 15),
            speed=4.0, noise_std=0.002, seed=77, **vk))
        cs = [jnp.asarray(v.clip(T)) for _ in range(n)]
        for c in cs:
            _ = float(jnp.sum(c))
        return cs

    a_ms = None
    keep_alive = []
    if arm != "alone":
        if arm == "seg_cb":
            a_name, ah, aw = "seg", H, W
        elif arm == "scene_360p":
            a_name, ah, aw = "scene", 360, 640
        else:
            a_name, ah, aw = "scene", H, W
        wl_a = zoo.load(a_name, (ah, aw, 3))
        chunks_a = clips(a_name, ah, aw, CHUNKS)
        if arm == "scene_dense":
            dn = jax.jit(lambda p, fs: jax.lax.map(
                lambda x: jnp.argmax(wl_a.net.apply_dense(p, x), -1)
                .astype(jnp.uint8), fs))
            d = dn(wl_a.params, chunks_a[0])
            _ = float(jnp.sum(d[-1]))
            t0 = time.perf_counter()
            for ch in chunks_a[1:]:
                d = dn(wl_a.params, ch)
            _ = float(jnp.sum(d[-1]))
            a_ms = ((time.perf_counter() - t0 - sync_overhead) * 1e3
                    / ((CHUNKS - 1) * T))
            keep_alive = [wl_a, chunks_a, dn, d]
        else:
            a_ms, fns = _measure_cb(wl_a, chunks_a, 1, sync_overhead)
            keep_alive = [wl_a, chunks_a, fns]

        if arm == "scene_cb+clear":
            jax.clear_caches()
        elif arm == "scene_cb+del":
            keep_alive = []
            del wl_a, chunks_a, fns
            gc.collect()

    pre_b = _hbm_stats()
    wl_b = zoo.load("seg", (H, W, 3))
    chunks_b = clips("seg", H, W, CHUNKS)
    b_ms, _ = _measure_cb(wl_b, chunks_b, REPS, sync_overhead)
    out = {"arm": arm, "b_model": "seg",
           "b_cb_ms_per_frame": round(b_ms, 4),
           "a_ms_per_frame": round(a_ms, 4) if a_ms else None,
           "hbm_before_b": pre_b,
           "keep_alive_objects": len(keep_alive)}
    print("ARM_RESULT " + json.dumps(out), flush=True)
    return 0


def main():
    if "--arm" in sys.argv:
        return run_arm(sys.argv[sys.argv.index("--arm") + 1])
    results = []
    for arm in ARMS:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--arm", arm],
            capture_output=True, text=True, timeout=1800,
            cwd="/root/repo")
        rows = [json.loads(l.split("ARM_RESULT ", 1)[1])
                for l in r.stdout.splitlines() if l.startswith("ARM_RESULT")]
        if r.returncode != 0 or not rows:
            results.append({"arm": arm, "error":
                            (r.stderr or r.stdout)[-800:]})
            print(f"{arm}: FAILED", flush=True)
            continue
        results.append(rows[-1])
        print(f"{arm}: B = {rows[-1]['b_cb_ms_per_frame']} ms/frame "
              f"(A = {rows[-1]['a_ms_per_frame']})", flush=True)

    alone = next((r for r in results
                  if r["arm"] == "alone" and "error" not in r), None)
    for r in results:
        if alone and "error" not in r:
            r["slowdown_vs_alone"] = round(
                r["b_cb_ms_per_frame"] / alone["b_cb_ms_per_frame"], 3)
    out = {"arms": results,
           "protocol": (f"B = seg {H}x{W} CB scan, {CHUNKS} chunks x {T} "
                        f"frames, median of {REPS}; each arm a fresh "
                        "subprocess; A = one polluter pass before B")}
    with open("/root/repo/INPROCESS.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote INPROCESS.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
