"""End-to-end demo: convert a pretrained torch CNN to change-based TPU
inference (the reference's drop-in workflow, SURVEY.md C10).

Builds a small torch scene CNN, "pretrains" it (a few SGD steps on the
synthetic sprite task so the weights are not random noise), imports its
state_dict into the layer-spec IR (OIHW -> HWIO), converts with the
flagship policy, and streams a clip — verifying the CB output matches the
dense forward of the SAME imported weights.

Usage: python scripts/demo_torch_import.py  (runs on CPU or TPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import torch
    import torch.nn as nn

    from cbinfer_tpu.config import PipelineConfig, TileConfig
    from cbinfer_tpu.convert import (convert_flagship, num_cb_layers,
                                     specs_from_torch)
    from cbinfer_tpu.metrics import miou
    from cbinfer_tpu.runner import scan_video
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig

    H, W, K = 144, 192, 8

    # --- the user's pretrained torch model (structure mirrors "scene") ---
    torch_model = nn.Sequential(
        nn.Conv2d(3, 32, 3, padding=1), nn.ReLU(),
        nn.MaxPool2d(2),
        nn.Conv2d(32, 64, 3, padding=1), nn.ReLU(),
        nn.MaxPool2d(2),
        nn.Conv2d(64, 64, 3, padding=1), nn.ReLU(),
        nn.Conv2d(64, 64, 3, padding=1), nn.ReLU(),
        nn.Conv2d(64, K, 1),
    )
    # a few supervised steps so the weights carry real structure
    video = SpriteVideo(SpriteVideoConfig(height=H, width=W, n_sprites=3,
                                          sprite_size=24, seed=1))
    frames, labels = video.clip_with_labels(8)
    x_t = torch.from_numpy(frames.transpose(0, 3, 1, 2))           # NCHW
    y_t = torch.from_numpy(labels[:, ::4, ::4].astype(np.int64))   # stride 4
    opt = torch.optim.Adam(torch_model.parameters(), lr=3e-3)
    for step in range(30):
        opt.zero_grad()
        loss = nn.functional.cross_entropy(torch_model(x_t), y_t)
        loss.backward()
        opt.step()
    print(f"torch pretrain: final loss {float(loss):.3f}")

    # --- auto-convert: walk the torch module, zero hand-written specs ---
    specs, params = specs_from_torch(torch_model)
    print("walked specs:", [type(s).__name__ for s in specs])

    # --- convert + stream ---
    from cbinfer_tpu.benchmark import devices_or_die  # bounded: tunnel can hang
    on_tpu = any(d.platform == "tpu" for d in devices_or_die())
    cfg = PipelineConfig(tile=TileConfig(8, 8, capacity_fraction=0.5),
                         backend="pallas" if on_tpu else "jnp")
    net = convert_flagship(specs, (H, W, 3), cfg)
    n_cb = num_cb_layers(net.specs)
    clip = jnp.asarray(video.clip(12))
    taus = jnp.full((n_cb,), 0.04, jnp.float32)
    ys, state, stats = jax.jit(
        lambda p, f: scan_video(net, p, f, thresholds=taus))(params, clip)
    dense = jnp.stack([net.apply_dense(params, f) for f in clip])
    m = miou(np.asarray(ys), np.asarray(dense), K)
    frac = float(np.mean([np.mean(np.asarray(s["computed_tiles"])
                                  / np.max(np.asarray(s["n_tiles"])))
                          for s in jax.device_get(stats)
                          if s and "computed_tiles" in s]))
    print(f"CB-vs-dense mIoU {m:.4f} at tau=0.04; mean recompute "
          f"fraction {frac:.2f} (incl. cold start)")
    assert m >= 0.98, m
    print("torch import demo OK")


if __name__ == "__main__":
    sys.exit(main())
