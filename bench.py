"""Headline benchmark: CB vs dense frames/sec/chip on 720p video.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} as required
by the driver. Metric definition per BASELINE.json: frames/sec/chip on 720p
video; vs_baseline = CB fps / dense fps on identical inputs (>=2x is the
target). Runs on whatever jax.devices() provides (the real TPU chip under
the driver). Details (per-layer stats, Pareto sweeps) live in the full
harness (cbinfer_tpu/benchmark.py); this file stays minimal and stable.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from cbinfer_tpu.config import PipelineConfig, TileConfig
    from cbinfer_tpu.convert import convert
    from cbinfer_tpu.models import get_model
    from cbinfer_tpu.network import init_params
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig

    H, W = 720, 1280
    n_frames = 16
    backend = "pallas" if any(d.platform == "tpu" for d in jax.devices()) \
        else "jnp"
    # Pallas backend lands in M2; fall back to jnp until then.
    try:
        import cbinfer_tpu.ops.pallas.delta_conv  # noqa: F401
    except ImportError:
        backend = "jnp"

    specs = get_model("scene", num_classes=8, width=32)
    cfg = PipelineConfig(
        tile=TileConfig(tile_h=8, tile_w=8, capacity_fraction=0.375),
        backend=backend)
    net = convert(specs, (H, W, 3), cfg,
                  thresholds=[0.04] * 7)
    params = init_params(specs, (H, W, 3), jax.random.PRNGKey(0))

    video = SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=4, sprite_size=48, speed=4.0,
        noise_std=0.002, seed=0))
    frames = jnp.asarray(video.clip(n_frames))

    # --- dense baseline ---
    dense_step = jax.jit(lambda p, x: net.apply_dense(p, x))
    y = dense_step(params, frames[0]).block_until_ready()  # compile+warmup
    t0 = time.perf_counter()
    for i in range(n_frames):
        y = dense_step(params, frames[i % n_frames])
    y.block_until_ready()
    dense_fps = n_frames / (time.perf_counter() - t0)

    # --- CB path ---
    cb_step = jax.jit(net.apply, donate_argnums=1)
    state = net.init_state()
    y, state, _ = cb_step(params, state, frames[0])  # compile + cold start
    jax.block_until_ready(y)
    # warm the caches with one pass so timing reflects steady state
    for i in range(1, n_frames):
        y, state, _ = cb_step(params, state, frames[i])
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for i in range(n_frames):
        y, state, stats = cb_step(params, state, frames[i % n_frames])
    jax.block_until_ready(y)
    cb_fps = n_frames / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "frames/sec/chip, 720p scene-labeling CNN (CB path)",
        "value": round(cb_fps, 3),
        "unit": "fps",
        "vs_baseline": round(cb_fps / dense_fps, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
