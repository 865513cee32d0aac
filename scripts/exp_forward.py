"""Measure conv mask-forwarding policies on a real workload (VERDICT r2
task 2 lever b): seg/pose at 720p, flagship config vs forwarding variants.

Forwarding (ConvSpec.forward_hint) removes a layer's detection entirely
(mask = dilated producer hint + sparse tile copy) at the cost of a
conservative-superset recompute set that GROWS with depth (no tau reset).
Whether that wins is an empirical trade per layer depth — this script
measures it:

  base        flagship (re-detection everywhere)
  fwd_deep    forwarding on convs at <= 1/2 input resolution
  fwd_all     forwarding on every hinted conv (stem/classifier excluded)

Writes EXP_forward.json rows {variant: {cb_fps, flop_reduction}}.
Usage: python scripts/exp_forward.py [seg|pose|scene] [H W]
"""

import dataclasses
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


def main():
    from cbinfer_tpu.benchmark import measure_sync_overhead, scalar_sync
    from cbinfer_tpu.config import (ConvSpec, PipelineConfig, TileConfig,
                                    UpsampleSpec)
    from cbinfer_tpu.convert import convert_flagship, num_cb_layers
    from cbinfer_tpu.checkpoint import load_npz_params
    from cbinfer_tpu.metrics import effective_flops
    from cbinfer_tpu.models import get_model
    from cbinfer_tpu.network import init_params, out_shapes
    from cbinfer_tpu.runner import scan_video
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig

    name = sys.argv[1] if len(sys.argv) > 1 else "seg"
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 720
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 1280
    T, chunks = 32, 2
    width = {"seg": 64, "pose": 64, "scene": 128}[name]
    from cbinfer_tpu.benchmark import devices_or_die  # bounded: tunnel can hang
    on_tpu = any(d.platform == "tpu" for d in devices_or_die())
    specs = (get_model(name, width=width) if name == "pose"
             else get_model(name, num_classes=8, width=width))
    if isinstance(specs[-1], UpsampleSpec):
        specs = specs[:-1]
    cfg = PipelineConfig(tile=TileConfig(8, 8),
                         backend="pallas" if on_tpu else "jnp",
                         compute_dtype="bfloat16" if on_tpu else "float32",
                         cache_dtype="bfloat16" if on_tpu else "float32")
    params = init_params(specs, (H, W, 3), jax.random.PRNGKey(0))
    try:
        params = load_npz_params(f"/root/repo/ckpts/{name}_w{width}.npz",
                                 params)
    except Exception as e:
        print(f"WARNING random weights ({e})", file=sys.stderr)
    try:
        with open(f"/root/repo/ckpts/{name}_w{width}_tau.json") as f:
            taus = json.load(f)["thresholds"]
    except Exception:
        taus = None

    shapes = [(H, W, 3)] + list(out_shapes(specs, (H, W, 3)))

    def variant_specs(mode):
        out = []
        for i, s in enumerate(specs):
            if (isinstance(s, ConvSpec) and 0 < i < len(specs) - 1
                    and s.use_cb):
                deep = shapes[i][0] <= H // 2
                if mode == "fwd_all" or (mode == "fwd_deep" and deep):
                    s = dataclasses.replace(s, forward_hint=True)
            out.append(s)
        return out

    sync_overhead = measure_sync_overhead()
    base = int(time.time() * 1e3) % 100000
    video = SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=4, sprite_size=48, speed=4.0,
        noise_std=0.002, seed=base))
    warm = jnp.asarray(video.clip(T))
    clips = [jnp.asarray(video.clip(T)) for _ in range(chunks)]
    for c in clips + [warm]:
        scalar_sync(c)

    results = {}
    for mode in ("base", "fwd_deep", "fwd_all"):
        vs = variant_specs(mode)
        net = convert_flagship(vs, (H, W, 3), cfg)
        n_cb = num_cb_layers(net.specs)
        tv = jnp.asarray(taus if taus and len(taus) == n_cb
                         else [0.04] * n_cb, jnp.float32)
        run = jax.jit(
            lambda p, fs, st, tv, _n=net: scan_video(
                _n, p, fs, state=st, thresholds=tv),
            donate_argnums=(2,))
        ys, st, stats = run(params, warm, net.init_state(), tv)
        scalar_sync(ys)
        all_stats = []
        t0 = time.perf_counter()
        for c in clips:
            ys, st, stats = run(params, c, st, tv)
            all_stats.append(stats)
        scalar_sync(ys)
        fps = chunks * T / max(1e-9, time.perf_counter() - t0
                               - sync_overhead)
        # FLOP accounting over ALL timed chunks (benchmark.py parity:
        # a single chunk's change rate over- or under-states the
        # reduction when sprite motion varies chunk to chunk)
        from cbinfer_tpu.benchmark import concat_stats
        stats = concat_stats(all_stats)
        ef = effective_flops(stats, net.specs, (H, W, 3),
                             8, 8)
        results[mode] = {"cb_fps": round(fps, 1),
                         "flop_reduction": round(ef["flop_reduction"], 2)}
        print(mode, results[mode], flush=True)

    out = {}
    path = "/root/repo/EXP_forward.json"
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    out[f"{name}_{H}x{W}"] = results
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote EXP_forward.json")


if __name__ == "__main__":
    sys.exit(main())
