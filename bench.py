"""Headline benchmark: CB vs dense frames/sec/chip on 720p video.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} as required
by the driver. Metric definition per BASELINE.json: frames/sec/chip on 720p
video; vs_baseline = CB fps / dense fps on identical inputs (>=2x target).

Timing notes (hard-won; see scripts/tpu_session.py):
  * frame loops live INSIDE one jitted dispatch (lax.map / lax.scan) —
    python-loop dispatch timing measures tunnel latency or gets memoized;
  * every timed dispatch sees fresh frames (the CB state is a fixed point
    under a repeated clip, and the runtime memoizes identical dispatches);
  * clips are forced device-resident (scalar-fetch) before timing;
  * block_until_ready is unreliable here — sync via scalar fetch.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    from cbinfer_tpu.config import PipelineConfig, TileConfig
    from cbinfer_tpu.convert import convert
    from cbinfer_tpu.models import get_model
    from cbinfer_tpu.network import init_params
    from cbinfer_tpu.runner import scan_video
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig

    H, W = 720, 1280
    T = 32          # frames per timed dispatch
    CHUNKS = 3      # timed dispatches (distinct frames each)
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    backend = "pallas" if on_tpu else "jnp"

    # Per-sync overhead of this host<->device link (dispatch + scalar-fetch
    # round trip), measured on a null op and subtracted from elapsed times:
    # the metric is device throughput, not tunnel latency.
    sync = jax.jit(lambda a: jnp.sum(a) * 0 + 1.0)
    _ = float(sync(jnp.ones((8, 128))))
    t0 = time.perf_counter()
    for _ in range(3):
        _ = float(sync(jnp.ones((8, 128))))
    sync_overhead = (time.perf_counter() - t0) / 3

    # scene-labeling CNN at MXU-friendly width (BASELINE configs[1] family)
    specs = get_model("scene", num_classes=8, width=128)
    cfg = PipelineConfig(
        tile=TileConfig(tile_h=8, tile_w=8, capacity_fraction=0.375),
        backend=backend,
        compute_dtype="bfloat16" if on_tpu else "float32",
        cache_dtype="bfloat16" if on_tpu else "float32")
    net = convert(specs, (H, W, 3), cfg, thresholds=[0.04] * 7,
                  dense_layers=[0])
    # trained weights (scripts/train_scene.py) give realistic change rates
    # and decision margins; fall back to random init if absent
    params = init_params(specs, (H, W, 3), jax.random.PRNGKey(0))
    try:
        flat = np.load("/root/repo/ckpts/scene_w128.npz")
        params = [
            (jnp.asarray(flat[f"w{i}"]),
             jnp.asarray(flat[f"b{i}"]) if f"b{i}" in flat else None)
            if p is not None else None
            for i, p in enumerate(params)]
    except Exception:
        pass

    video = SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=4, sprite_size=48, speed=4.0,
        noise_std=0.002, seed=0))
    chunks = [jnp.asarray(video.clip(T)) for _ in range(CHUNKS)]
    for ch in chunks:
        _ = float(jnp.sum(ch))  # force device-resident

    # --- dense baseline ---
    def dense_body(p, fs):
        ys = jax.lax.map(lambda x: net.apply_dense(p, x), fs)
        return ys, jnp.sum(ys[-1]) * 0
    dense_scan = jax.jit(dense_body)
    d, eps = dense_scan(params, chunks[0])
    _ = float(jnp.sum(d[-1]))  # compile + warm
    t0 = time.perf_counter()
    for ch in chunks:
        d, eps = dense_scan(params, ch + eps)
    _ = float(jnp.sum(d[-1]))
    dense_fps = CHUNKS * T / max(1e-9,
                                 time.perf_counter() - t0 - sync_overhead)

    # --- CB path ---
    cb_scan = jax.jit(lambda p, fs, st: scan_video(net, p, fs, state=st),
                      donate_argnums=(2,))
    ys, state, _ = cb_scan(params, chunks[0], net.init_state())
    _ = float(jnp.sum(ys[-1]))  # compile + cold start + cache warm
    t0 = time.perf_counter()
    for ch in chunks:
        ys, state, _ = cb_scan(params, ch, state)
    _ = float(jnp.sum(ys[-1]))
    cb_fps = CHUNKS * T / max(1e-9,
                              time.perf_counter() - t0 - sync_overhead)

    print(json.dumps({
        "metric": "frames/sec/chip, 720p scene-labeling CNN (CB path)",
        "value": round(cb_fps, 3),
        "unit": "fps",
        "vs_baseline": round(cb_fps / dense_fps, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
