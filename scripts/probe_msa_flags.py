"""Perf-only probe: CB steady-state throughput under XLA/libtpu flag
variants (one flag set per PROCESS — set LIBTPU_INIT_ARGS before launch).

Target: the MSA staging copies of the aliased Pallas cache operands
(RESULTS.md "Negative results", r3 xprof: ~114 us/frame on scene, a full
VMEM round trip per frame of pool/detect caches whose kernels only touch
dirty tiles). Global MSA disable measured as a big loss (570 vs 774 fps);
this probe measures the SURGICAL knobs found in this libtpu build:

  --xla_msa_max_outstanding_prefetches=N   throttle/forbid staging copies
  --xla_tpu_scoped_vmem_limit_kib=N        shrink MSA's VMEM budget
  --xla_tpu_msa_inefficient_use_to_copy_ratio=F

Prints ONE JSON line {model, libtpu_init_args, cb_fps, ms_per_frame} —
compare across processes with large timed windows (8x32 frames, sync
overhead subtracted; same methodology as bench.py). The persistent
compile cache is DISABLED here: its key may not include libtpu flags, and
a stale executable would fake "no effect".

Usage: LIBTPU_INIT_ARGS="--flag=..." python scripts/probe_msa_flags.py [model]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_compilation_cache", False)


def main():
    from cbinfer_tpu import zoo
    from cbinfer_tpu.benchmark import devices_or_die, measure_sync_overhead
    from cbinfer_tpu.runner import scan_video
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig

    name = sys.argv[1] if len(sys.argv) > 1 else "scene"
    H, W = 720, 1280
    T, CHUNKS = 32, 8
    if not any(d.platform == "tpu" for d in devices_or_die()):
        print(json.dumps({"model": name, "error": "not on TPU"}))
        return 1
    sync_overhead = measure_sync_overhead()

    wl = zoo.load(name, (H, W, 3))
    net, params = wl.net, wl.params
    tv = jnp.asarray(wl.taus, jnp.float32)
    out_u8 = (None if name.startswith("pose")
              else (lambda y: jnp.argmax(y, -1).astype(jnp.uint8)))
    cadence, _src = zoo.load_refresh_cadence(name, T, H, W)
    cadence = min(cadence, CHUNKS)

    run_seed = int(time.time() * 1e3) % 100000
    video = SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=4, sprite_size=48, speed=4.0,
        noise_std=0.002, seed=run_seed))
    warm = jnp.asarray(video.clip(T))
    chunks = [jnp.asarray(video.clip(T)) for _ in range(CHUNKS)]
    for ch in chunks + [warm]:
        _ = float(jnp.sum(ch))

    cb_refresh = jax.jit(
        lambda p, fs, st: scan_video(net, p, fs, state=st, thresholds=tv,
                                     refresh_start=True, out_map=out_u8,
                                     collect_stats="mean", ingest=True),
        donate_argnums=(2,))
    cb_plain = jax.jit(
        lambda p, fs, st: scan_video(net, p, fs, state=st, thresholds=tv,
                                     out_map=out_u8,
                                     collect_stats="mean", ingest=True),
        donate_argnums=(2,))

    ys, state, _ = cb_refresh(params, warm, net.init_state())
    _ = float(jnp.sum(ys[-1]))
    ys, state, _ = cb_plain(params, warm, state)
    _ = float(jnp.sum(ys[-1]))
    t0 = time.perf_counter()
    for i, ch in enumerate(chunks):
        f = cb_refresh if i % cadence == 0 else cb_plain
        ys, state, _ = f(params, ch, state)
    _ = float(jnp.sum(ys[-1]))
    dt = time.perf_counter() - t0 - sync_overhead
    fps = CHUNKS * T / max(1e-9, dt)

    # dense twin under the SAME process flags: a flag that sandbags the
    # dense path would inflate the CB-vs-dense ratio dishonestly — adopt a
    # flag only if dense holds (bench.py times both paths in one process).
    dense_out = out_u8 or (lambda y: y)
    dense_scan = jax.jit(
        lambda p, fs: jax.lax.map(lambda x: dense_out(net.apply_dense(p, x)),
                                  fs))
    d = dense_scan(params, warm)
    _ = float(jnp.sum(d[-1] if not isinstance(d, tuple) else d[0][-1]))
    t0 = time.perf_counter()
    for ch in chunks:
        d = dense_scan(params, ch)
    _ = float(jnp.sum(d[-1] if not isinstance(d, tuple) else d[0][-1]))
    ddt = time.perf_counter() - t0 - sync_overhead
    dense_fps = CHUNKS * T / max(1e-9, ddt)

    print(json.dumps({
        "model": name,
        "libtpu_init_args": os.environ.get("LIBTPU_INIT_ARGS", ""),
        "cb_fps": round(fps, 1),
        "ms_per_frame": round(1e3 * dt / (CHUNKS * T), 4),
        "dense_fps": round(dense_fps, 1),
        "dense_ms_per_frame": round(1e3 * ddt / (CHUNKS * T), 4),
        "refresh_every_chunks": cadence,
        "seed": run_seed,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
