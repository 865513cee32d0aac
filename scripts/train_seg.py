"""Train the seg CNN on synthetic sprites (TPU), save ckpt + npz.

Mirrors scripts/train_scene.py for the segmentation workload family
(SURVEY.md C17 / configs[2]): trained weights give real decision margins so
the accuracy-vs-threshold trade-off at 720p is meaningful.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cbinfer_tpu.models import get_model
from cbinfer_tpu.train import train_segmentation
from cbinfer_tpu import checkpoint

NUM_CLASSES, WIDTH = 8, 64
Ht, Wt = 192, 256          # train at low res; conv nets are size-agnostic
specs = get_model("seg", num_classes=NUM_CLASSES, width=WIDTH)
t0 = time.time()
# 16 videos cover all 7 palette classes; 600 steps for generalization
# (300 steps / 8 videos left ground-truth mIoU at 0.88 on unseen seeds
# while scene's 600/16 recipe reaches 0.9995)
# the seg deployment distribution since r5 is graded-change on the hard
# palette (video.workload_video_kwargs) — train on the same distribution
# so the margins the tuner trades are in-distribution; 1200 steps (the
# hard-palette scene recipe) for the lower-contrast task
from cbinfer_tpu.video import workload_video_kwargs
params, acc = train_segmentation(specs, (Ht, Wt, 3), NUM_CLASSES,
                                 steps=1200, batch=4, n_videos=16,
                                 verbose=True,
                                 video_kwargs=workload_video_kwargs("seg"))
print(f"trained: acc {acc:.3f} in {time.time()-t0:.0f}s", flush=True)
checkpoint.save("/root/repo/ckpts/seg_w64", params,
                extra={"acc": acc, "classes": NUM_CLASSES, "width": WIDTH})
flat = {}
for i, pr in enumerate(params):
    if pr is not None:
        flat[f"w{i}"] = np.asarray(pr[0])
        if pr[1] is not None:
            flat[f"b{i}"] = np.asarray(pr[1])
np.savez("/root/repo/ckpts/seg_w64.npz", **flat)
print("saved ckpts/seg_w64 (orbax) and ckpts/seg_w64.npz")
