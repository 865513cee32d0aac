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
CHUNKS = 4  # timed steady-state chunks (distinct data each dispatch)

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
                     backend=BACKEND, compute_dtype="bfloat16",
                     cache_dtype="bfloat16")
net = convert(specs, (H, W, 3), cfg, dense_layers=[0])  # plain dense stem; L1 uses the fused full-map detect kernel
params = init_params(specs, (H, W, 3), jax.random.PRNGKey(0))
print(f"model: {dense_flops(specs, (H,W,3))/1e9:.1f} GFLOP/frame dense, backend={BACKEND} tile={TILE}", flush=True)

video = SpriteVideo(SpriteVideoConfig(
    height=H, width=W, n_sprites=4, sprite_size=32, speed=4.0,
    noise_std=0.002, seed=0))
clip = jnp.asarray(video.clip(T))
# distinct continuation chunks: the runtime memoizes identical dispatches
# AND the CB state is a fixed point under a repeated clip, so every timed
# dispatch must see fresh frames.
chunks = [jnp.asarray(video.clip(T)) for _ in range(CHUNKS)]
# force host->device transfer NOW (lazy transfers over the tunnel otherwise
# land inside the timed loops; scalar-fetch is the only reliable sync)
for ch in chunks:
    _ = float(jnp.sum(ch))
print("clip ready (device-resident)", flush=True)

# dense baseline. NOTE: timing must put the frame loop INSIDE one jitted
# dispatch and chain data dependence between reps — per-dispatch python
# loops measure dispatch latency (or runtime caching), not device work.
def dense_body(p, fs):
    ys = jax.lax.map(lambda x: net.apply_dense(p, x), fs)
    # chain: feed a scalar of the output back so reps can depend on it
    return ys, jnp.sum(ys[-1]) * 0
dense_scan = jax.jit(dense_body)
t0=time.time()
d, eps = jax.block_until_ready(dense_scan(params, clip))
print(f"dense compile+run {time.time()-t0:.0f}s", flush=True)
t0=time.time()
for ch in chunks:
    d, eps = dense_scan(params, ch + eps)
_ = float(jnp.sum(d[-1]))  # scalar fetch: block_until_ready is unreliable
dense_ms = (time.time()-t0)/CHUNKS/T*1e3
dense_fps = 1e3/dense_ms
print(f"dense: {dense_fps:.1f} fps ({dense_ms:.3f} ms/frame)", flush=True)

# CB path
t0=time.time()
cb_scan = jax.jit(lambda p, fs, st: scan_video(net, p, fs, state=st), donate_argnums=(2,))
ys, state, stats = jax.block_until_ready(cb_scan(params, clip, net.init_state()))
print(f"cb compile+cold {time.time()-t0:.0f}s", flush=True)
ys, state, stats = jax.block_until_ready(cb_scan(params, clip, state))  # steady state
t0=time.time()
for ch in chunks:
    ys, state, stats = cb_scan(params, ch, state)  # streaming continuation
_ = float(jnp.sum(ys[-1]))  # scalar fetch forces a real device sync
cb_ms = (time.time()-t0)/CHUNKS/T*1e3
cb_fps = 1e3/cb_ms
print(f"cb:    {cb_fps:.1f} fps ({cb_ms:.3f} ms/frame) -> speedup {cb_fps/dense_fps:.2f}x", flush=True)
ef = effective_flops(jax.device_get(stats), net.specs, (H,W,3), TILE, TILE)
print(f"flop reduction: {ef['flop_reduction']:.2f}x", flush=True)
m = miou(np.asarray(ys), np.asarray(d), 12)
print(f"mIoU vs dense: {m:.4f}", flush=True)
print(summarize_stats(jax.device_get(stats), net.specs), flush=True)
