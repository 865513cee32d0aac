"""Tune per-layer thresholds for the 720p scene CNN on the chip (C13).

Runs the auto-tuner at the BASELINE accuracy budget (<=0.5% mIoU drop, i.e.
budget=0.005) on a calibration clip DISJOINT from the benchmark video
(different seed), persists the chosen tau vector to ckpts/scene_w128_tau.json
(bench.py loads it), and writes the full Pareto curve to TUNE_scene.json.
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    from cbinfer_tpu.config import PipelineConfig, TileConfig
    from cbinfer_tpu.convert import convert, num_cb_layers
    from cbinfer_tpu.checkpoint import save_thresholds
    from cbinfer_tpu.metrics import miou
    from cbinfer_tpu.models import get_model
    from cbinfer_tpu.tuner import tune
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig
    import bench as _bench

    # T=96: the calibration horizon must cover STEADY-STATE drift — the
    # accepted-value rule converges to its error bound over ~100 frames,
    # and a 32-frame calib under-prices large taus (measured r2: taus that
    # scored 0.998 on 32 frames scored 0.957 on the bench's 128-frame
    # stream).
    H, W, T = 720, 1280, 96
    NUM_CLASSES = 8
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    backend = "pallas" if on_tpu else "jnp"

    specs = get_model("scene", num_classes=NUM_CLASSES, width=128)
    cfg = PipelineConfig(
        tile=TileConfig(tile_h=8, tile_w=8, capacity_fraction=0.375),
        backend=backend,
        compute_dtype="bfloat16" if on_tpu else "float32",
        cache_dtype="bfloat16" if on_tpu else "float32")
    net = convert(specs, (H, W, 3), cfg)  # layer 0 -> fused banded stem kernel (ops/pallas/stem.py)
    params, weights_src = _bench._load_params(specs, (H, W, 3))
    assert weights_src != "random", "tune requires trained weights"

    # calibration clip: different seed from the bench video (seed=0)
    calib = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=4, sprite_size=48, speed=4.0,
        noise_std=0.002, seed=7)).clip(T))

    # grid: 0.01 is below the bf16-cache quantization + sensor-noise floor
    # (full-map changes, no gain) and 0.15 drifts too far at steady state —
    # both measured r2
    # Deployment runs with a periodic full refresh (runner.scan_video
    # refresh_every): it bounds worst-case cache staleness to K frames for
    # one dense-equivalent frame per K, which is what makes <=0.5%
    # achievable at steady state. Calibrate under the same policy.
    REFRESH = 32
    res = tune(net, params, calib,
               functools.partial(miou, num_classes=NUM_CLASSES),
               tau_grid=(0.02, 0.03, 0.045, 0.07, 0.1, 0.15),
               budgets=(0.001, 0.002, 0.005, 0.01, 0.02),
               budget=0.005, skip_frames=8, refresh_every=REFRESH,
               verbose=True)

    print(f"selected taus: {res.thresholds}")
    print(f"calib metric {res.metric:.5f}  "
          f"flop reduction {res.flop_reduction:.2f}x")
    save_thresholds("/root/repo/ckpts/scene_w128_tau.json", res.thresholds,
                    metadata={"budget": 0.005, "metric": res.metric,
                              "flop_reduction": res.flop_reduction,
                              "calib": "sprites seed=7 T=96 720p",
                              "refresh_every": REFRESH,
                              "weights": weights_src})
    with open("/root/repo/TUNE_scene.json", "w") as f:
        f.write(res.to_json())
    print("wrote ckpts/scene_w128_tau.json and TUNE_scene.json")


if __name__ == "__main__":
    sys.exit(main())
