"""On-chip bit-parity check of the fused consumer-detect path.

The interpret-mode parity suites (tests/test_delta_conv_detect.py,
tests/test_fused_network.py) prove the fused kernel's semantics; this
script proves the COMPILED Mosaic behavior on the real chip: stream a
720p clip through the fused and unfused variants of a zoo workload and
require bit-identical outputs, per-layer caches, and stats counters.

Usage: python scripts/check_fused_parity_tpu.py [model] [frames]
Prints one JSON line {model, frames, fused_layers, outputs_equal,
states_equal, stats_equal, max_out_delta}.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    from cbinfer_tpu import zoo
    from cbinfer_tpu.benchmark import devices_or_die
    from cbinfer_tpu.runner import scan_video
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig
    from scripts.exp_fused_ab import strip_fused, with_fused

    name = sys.argv[1] if len(sys.argv) > 1 else "pose"
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    H, W = 720, 1280
    if not any(d.platform == "tpu" for d in devices_or_die()):
        print(json.dumps({"model": name, "error": "not on TPU"}))
        return 1

    wl = zoo.load(name, (H, W, 3))
    net_u, params = strip_fused(wl.net), wl.params
    net_f = with_fused(net_u)
    nf = sum(1 for s in net_f.specs
             if getattr(s, "fuse_next_detect", False))
    assert nf > 0, f"{name}: nothing fused"
    tv = jnp.asarray(wl.taus, jnp.float32)

    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=4, sprite_size=48, speed=4.0,
        noise_std=0.002, seed=5)).clip(T))

    def run(net):
        return jax.jit(lambda p, fs: scan_video(
            net, p, fs, thresholds=tv))(params, clip)

    ys_f, st_f, s_f = run(net_f)
    ys_u, st_u, s_u = run(net_u)
    out_eq = bool(jnp.array_equal(ys_f, ys_u))
    st_eq = all(bool(jnp.array_equal(a, b)) for a, b in
                zip(jax.tree.leaves(st_f), jax.tree.leaves(st_u)))
    stats_eq = all(bool(jnp.array_equal(a, b)) for a, b in
                   zip(jax.tree.leaves(s_f), jax.tree.leaves(s_u)))
    print(json.dumps({
        "model": name, "frames": T, "fused_layers": nf,
        "outputs_equal": out_eq, "states_equal": st_eq,
        "stats_equal": stats_eq,
        "max_out_delta": float(jnp.max(jnp.abs(
            ys_f.astype(jnp.float32) - ys_u.astype(jnp.float32)))),
    }))
    return 0 if (out_eq and st_eq and stats_eq) else 1


if __name__ == "__main__":
    sys.exit(main())
