"""On-chip repro of the seg GT-mIoU degradation seen in the r3 eval rerun.

Runs the exact eval_headline protocol (pallas backend, bf16 compute+cache,
tuned taus, chunk-start refresh every 2nd chunk) at a FIXED seed and prints
per-chunk dense/CB ground-truth mIoU + agreement, so the 10 pp TPU-only
delta can be attributed (pallas path vs bf16 vs seed luck)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cbinfer_tpu.config import PipelineConfig, TileConfig, UpsampleSpec
from cbinfer_tpu.convert import convert_flagship
from cbinfer_tpu.checkpoint import load_npz_params
from cbinfer_tpu.metrics import miou, miou_labels
from cbinfer_tpu.models import get_model
from cbinfer_tpu.network import init_params, out_shapes
from cbinfer_tpu.runner import scan_video
from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 65601
    backend = sys.argv[2] if len(sys.argv) > 2 else "pallas"
    cache_dtype = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"
    H, W, T, chunks = 720, 1280, 32, 2
    specs = get_model("seg", num_classes=8, width=64)
    if isinstance(specs[-1], UpsampleSpec):
        specs = specs[:-1]
    cfg = PipelineConfig(tile=TileConfig(8, 8), backend=backend,
                         compute_dtype="bfloat16", cache_dtype=cache_dtype)
    net = convert_flagship(specs, (H, W, 3), cfg)
    params = init_params(specs, (H, W, 3), jax.random.PRNGKey(0))
    params = load_npz_params("/root/repo/ckpts/seg_w64.npz", params)
    taus = jnp.asarray(json.load(
        open("/root/repo/ckpts/seg_w64_tau.json"))["thresholds"], jnp.float32)
    video = SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=4, sprite_size=48, speed=4.0,
        noise_std=0.002, seed=seed))
    stride = H // out_shapes(net.specs, (H, W, 3))[-1][0]

    dense_scan = jax.jit(
        lambda p, fs: jax.lax.map(lambda x: net.apply_dense(p, x), fs))
    cb_refresh = jax.jit(
        lambda p, fs, st, tv: scan_video(net, p, fs, state=st,
                                         thresholds=tv, refresh_start=True),
        donate_argnums=(2,))
    cb_plain = jax.jit(
        lambda p, fs, st, tv: scan_video(net, p, fs, state=st,
                                         thresholds=tv),
        donate_argnums=(2,))
    state = net.init_state()
    if len(sys.argv) > 4 and sys.argv[4] == "warm":
        # mimic eval_headline EXACTLY: warm-up on a separate clip that
        # advances the generator, carrying the polluted state into the
        # timed chunks (the refresh prolog must erase it)
        warm_clip = jnp.asarray(video.clip(T))
        ys, state, _ = cb_refresh(params, warm_clip, state, taus)
        _ = np.asarray(ys[-1]).sum()
        ys, state, _ = cb_plain(params, warm_clip, state, taus)
        _ = np.asarray(ys[-1]).sum()
        dn = np.asarray(dense_scan(params, warm_clip))
    for i in range(chunks):
        f, l = video.clip_with_labels(T)
        fs = jnp.asarray(f)
        dn = np.asarray(dense_scan(params, fs))
        fcb = cb_refresh if i % 2 == 0 else cb_plain
        ys, state, stats = fcb(params, fs, state, taus)
        ys = np.asarray(ys)
        labs = np.asarray(l)[:, ::stride, ::stride]
        md = miou_labels(dn, labs, 8)
        mc = miou_labels(ys, labs, 8)
        ag = miou(ys, dn, num_classes=8)
        print(f"seed {seed} backend {backend} cache {cache_dtype} "
              f"chunk {i}: dense {md:.4f} cb {mc:.4f} "
              f"delta {md - mc:+.4f} agree {ag:.4f}", flush=True)


if __name__ == "__main__":
    main()
