"""Train the OpenPose-style pose CNN on synthetic sprite keypoints (TPU).

Mirrors scripts/train_seg.py for the pose workload family (SURVEY.md C17 /
configs[3], arXiv 1808.05488 §VI): the sprite generator's free keypoint
ground truth (video.pose_keypoints) supervises Gaussian heatmaps + PAF limb
fields (video.pose_targets), giving the net real decision margins so the
PCK-vs-threshold trade-off — and the BASELINE accuracy-degradation pillar —
is measurable against ground truth instead of random-weight agreement.
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
from cbinfer_tpu.train import train_pose
from cbinfer_tpu import checkpoint

WIDTH = 64
Ht, Wt = 192, 256          # train at low res; conv nets are size-agnostic
specs = get_model("pose", width=WIDTH)
t0 = time.time()
# graded-change hard-palette distribution since r5 (workload_video_kwargs);
# +50% steps for the lower-contrast class appearance
from cbinfer_tpu.video import workload_video_kwargs
params, train_pck = train_pose(specs, (Ht, Wt, 3), steps=3000, batch=4,
                               n_videos=24, verbose=True,
                               video_kwargs=workload_video_kwargs("pose"))
print(f"trained: train PCK {train_pck:.3f} in {time.time()-t0:.0f}s",
      flush=True)
checkpoint.save("/root/repo/ckpts/pose_w64", params,
                extra={"train_pck": train_pck, "width": WIDTH})
flat = {}
for i, pr in enumerate(params):
    if pr is not None:
        flat[f"w{i}"] = np.asarray(pr[0])
        if pr[1] is not None:
            flat[f"b{i}"] = np.asarray(pr[1])
np.savez("/root/repo/ckpts/pose_w64.npz", **flat)
print("saved ckpts/pose_w64 (orbax) and ckpts/pose_w64.npz")
