"""Consolidated TPU perf session: end-to-end CB vs dense on a wide seg net.

Enables the persistent compilation cache so reruns skip Mosaic compiles.
Prints per-phase progress unbuffered.
"""
import time, sys, numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cbinfer_tpu.config import ConvSpec, PoolSpec, PipelineConfig, TileConfig
from cbinfer_tpu.convert import convert
from cbinfer_tpu.network import init_params, dense_flops
from cbinfer_tpu.runner import scan_video
from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig
from cbinfer_tpu.metrics import effective_flops, miou
from cbinfer_tpu.profiling import summarize_stats

H, W = 360, 640   # start at 360p for quicker iteration; 720p in bench.py
BACKEND = sys.argv[1] if len(sys.argv) > 1 else "pallas"
TILE = int(sys.argv[2]) if len(sys.argv) > 2 else 8
T = 16

specs = [
    ConvSpec(features=128, threshold=0.04),
    ConvSpec(features=128, threshold=0.04),
    PoolSpec(threshold=0.04),
    ConvSpec(features=256, threshold=0.04),
    ConvSpec(features=256, threshold=0.04),
    PoolSpec(threshold=0.04),
    ConvSpec(features=256, threshold=0.04),
    ConvSpec(features=12, kernel=(1,1), activation=None, threshold=0.04),
]
cfg = PipelineConfig(tile=TileConfig(tile_h=TILE, tile_w=TILE, capacity_fraction=0.4),
                     backend=BACKEND)
net = convert(specs, (H, W, 3), cfg, dense_layers=[0])  # layer0: C=3, run dense
params = init_params(specs, (H, W, 3), jax.random.PRNGKey(0))
print(f"model: {dense_flops(specs, (H,W,3))/1e9:.1f} GFLOP/frame dense, backend={BACKEND} tile={TILE}", flush=True)

clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
    height=H, width=W, n_sprites=4, sprite_size=32, speed=4.0,
    noise_std=0.002, seed=0)).clip(T))
print("clip ready", flush=True)

# dense baseline
t0=time.time()
dense_scan = jax.jit(lambda p, fs: jax.lax.map(lambda x: net.apply_dense(p, x), fs))
d = jax.block_until_ready(dense_scan(params, clip)); print(f"dense compile {time.time()-t0:.0f}s", flush=True)
t0=time.time()
for _ in range(3): d = dense_scan(params, clip)
jax.block_until_ready(d)
dense_fps = T*3/(time.time()-t0)
print(f"dense: {dense_fps:.1f} fps ({1e3*3*T/ (time.time()-t0)/T/3:.2f} ms/frame)", flush=True)

# CB path
t0=time.time()
cb_scan = jax.jit(lambda p, fs, st: scan_video(net, p, fs, state=st), donate_argnums=(2,))
ys, state, stats = jax.block_until_ready(cb_scan(params, clip, net.init_state()))
print(f"cb compile+cold {time.time()-t0:.0f}s", flush=True)
ys, state, stats = jax.block_until_ready(cb_scan(params, clip, state))  # steady state
t0=time.time()
for _ in range(3): ys, state, stats = cb_scan(params, clip, state)
jax.block_until_ready(ys)
cb_fps = T*3/(time.time()-t0)
print(f"cb:    {cb_fps:.1f} fps  -> speedup {cb_fps/dense_fps:.2f}x", flush=True)
ef = effective_flops(jax.device_get(stats), net.specs, (H,W,3), TILE, TILE)
print(f"flop reduction: {ef['flop_reduction']:.2f}x", flush=True)
m = miou(np.asarray(ys), np.asarray(d), 12)
print(f"mIoU vs dense: {m:.4f}", flush=True)
print(summarize_stats(jax.device_get(stats), net.specs), flush=True)
