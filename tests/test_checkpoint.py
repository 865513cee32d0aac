"""Checkpoint/resume (SURVEY.md §5.4): params + streaming state round-trip."""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from cbinfer_tpu import checkpoint
from cbinfer_tpu.config import ConvSpec, PipelineConfig, PoolSpec, TileConfig
from cbinfer_tpu.convert import convert
from cbinfer_tpu.network import init_params
from cbinfer_tpu.runner import scan_video
from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig


def test_mid_video_resume_bit_exact():
    specs = [ConvSpec(features=8, threshold=0.02), PoolSpec(threshold=0.02),
             ConvSpec(features=5, kernel=(1, 1), activation=None,
                      threshold=0.02)]
    net = convert(specs, (32, 48, 3),
                  PipelineConfig(tile=TileConfig(tile_h=4, tile_w=4)))
    params = init_params(specs, (32, 48, 3), jax.random.PRNGKey(6))
    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=32, width=48, seed=13)).clip(8))

    # run 4 frames, checkpoint, run 4 more
    _, state4, _ = scan_video(net, params, clip[:4])
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt")
        checkpoint.save(path, params, state=state4,
                        extra={"frame": 4})
        restored = checkpoint.restore(
            path, like={"params": params, "state": net.init_state(),
                        "extra": {"frame": 0}})
    assert restored["extra"]["frame"] == 4
    ys_resumed, _, _ = scan_video(net, restored["params"], clip[4:],
                                  state=restored["state"])
    ys_full, _, _ = scan_video(net, params, clip)
    np.testing.assert_array_equal(np.asarray(ys_resumed),
                                  np.asarray(ys_full[4:]))


def test_threshold_json_roundtrip(tmp_path):
    p = str(tmp_path / "tau.json")
    checkpoint.save_thresholds(p, [0.1, 0.2], metadata={"model": "scene"})
    assert checkpoint.load_thresholds(p) == [0.1, 0.2]
