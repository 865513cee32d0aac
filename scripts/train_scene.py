"""Train scene CNN on synthetic sprites (TPU), save ckpt, eval CB accuracy.

``python scripts/train_scene.py hard`` trains the HARD-palette variant
(video.CLASS_PALETTE_HARD: low-contrast class colors + larger jitter) to
ckpts/scene_w128_hard.npz — the calibration task that makes tuned taus
non-trivial (saturated-grid uniform taus on the default palette are a
sign the margins are too wide to stress per-layer selection; VERDICT r2).
"""
import functools, json, sys, time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from cbinfer_tpu.config import PipelineConfig, TileConfig
from cbinfer_tpu.convert import convert, num_cb_layers
from cbinfer_tpu.metrics import effective_flops, miou
from cbinfer_tpu.models import get_model
from cbinfer_tpu.runner import scan_video
from cbinfer_tpu.train import train_segmentation
from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig
from cbinfer_tpu import checkpoint

NUM_CLASSES, WIDTH = 8, 128
PALETTE = "hard" if len(sys.argv) > 1 and sys.argv[1] == "hard" else "default"
SUFFIX = "_hard" if PALETTE == "hard" else ""
Ht, Wt = 192, 256          # train at low res; conv nets are size-agnostic
specs = get_model("scene", num_classes=NUM_CLASSES, width=WIDTH)
t0 = time.time()
# input_noise stays OFF: tau-scale train noise reached train-acc 1.000 but
# REDUCED CB-vs-dense agreement (0.9945 -> 0.978 at tau=0.05, measured r2)
# — it sharpens edge decision boundaries, which is exactly what cache
# drift perturbs. Kept as a train.py option for other data regimes.
# 16 videos cover all 7 palette classes (3-5 sprites each, random class
# draws); 600 steps converge comfortably on the palette task
params, acc = train_segmentation(specs, (Ht, Wt, 3), NUM_CLASSES,
                                 steps=600 if PALETTE == "default" else 1200,
                                 batch=4, n_videos=16, palette=PALETTE,
                                 verbose=True)
print(f"trained: acc {acc:.3f} in {time.time()-t0:.0f}s", flush=True)
checkpoint.save(f"/root/repo/ckpts/scene_w128{SUFFIX}", params,
                extra={"acc": acc, "classes": NUM_CLASSES, "width": WIDTH,
                       "palette": PALETTE})
# flat npz for fast dependency-free loading (bench.py)
flat = {}
for i, pr in enumerate(params):
    if pr is not None:
        flat[f"w{i}"] = np.asarray(pr[0])
        if pr[1] is not None:
            flat[f"b{i}"] = np.asarray(pr[1])
np.savez(f"/root/repo/ckpts/scene_w128{SUFFIX}.npz", **flat)

# eval CB-vs-dense at 720p with trained weights
H, W, T = 720, 1280, 24
cfg = PipelineConfig(tile=TileConfig(8, 8), backend="pallas",
                     compute_dtype="bfloat16", cache_dtype="bfloat16")
from cbinfer_tpu.convert import convert_flagship
net = convert_flagship(specs, (H, W, 3), cfg)
video = SpriteVideo(SpriteVideoConfig(height=H, width=W, n_sprites=4,
                                      sprite_size=72, speed=4.0,
                                      noise_std=0.002, palette=PALETTE,
                                      seed=123))
clips = [jnp.asarray(video.clip(T)) for _ in range(2)]
for c in clips: _ = float(jnp.sum(c))
for tau in (0.02, 0.05, 0.1):
    taus = jnp.asarray([tau] * num_cb_layers(net.specs), jnp.float32)
    cb_scan = jax.jit(lambda p, fs, st, tv: scan_video(net, p, fs, state=st, thresholds=tv),
                      donate_argnums=(2,))
    state = net.init_state()
    outs, douts = [], []
    dense_scan = jax.jit(lambda p, fs: jax.lax.map(lambda x: net.apply_dense(p, x), fs))
    for c in clips:
        ys, state, stats = cb_scan(params, c, state, taus)
        outs.append(np.asarray(ys))
        douts.append(np.asarray(dense_scan(params, c)))
    m = float(np.mean([miou(a, b, NUM_CLASSES) for a, b in zip(outs, douts)]))
    ef = effective_flops(jax.device_get(stats), net.specs, (H, W, 3), 8, 8)
    print(json.dumps({"tau": tau, "miou_vs_dense": round(m, 4),
                      "flop_reduction": round(ef["flop_reduction"], 2)}), flush=True)
