"""README-quickstart surface test: the documented public flows, end to end.

Mirrors the verification drive (.claude/skills/verify): everything here goes
through the package boundary exactly as README.md's code blocks do — golden
semantics, the convert()+scan_video pipeline, and zoo.load. If a refactor
breaks one of these, a user following the README breaks the same way.
(Reference parity: SURVEY.md §3.1/§3.2 entry points.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbinfer_tpu.config import ConvSpec, PoolSpec, PipelineConfig, TileConfig
from cbinfer_tpu.convert import convert, num_cb_layers
from cbinfer_tpu.golden import GoldenCBNet
from cbinfer_tpu.models import get_model
from cbinfer_tpu.network import init_params
from cbinfer_tpu.runner import scan_video
from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig


def _conv_params(rng, kh, kw, cin, cout):
    return (rng.standard_normal((kh, kw, cin, cout)).astype(np.float32) * 0.2,
            rng.standard_normal((cout,)).astype(np.float32) * 0.1)


def test_readme_golden_flow_tau0_bit_exact_and_sparse():
    rng = np.random.default_rng(0)
    layers = [
        (ConvSpec(features=8, kernel=(3, 3), activation="relu",
                  threshold=0.0), _conv_params(rng, 3, 3, 3, 8)),
        (PoolSpec(window=(2, 2), stride=(2, 2)), None),
        (ConvSpec(features=4, kernel=(3, 3), activation="relu",
                  threshold=0.0), _conv_params(rng, 3, 3, 8, 4)),
    ]
    video = SpriteVideo(SpriteVideoConfig(height=48, width=64, n_sprites=2,
                                          sprite_size=12, seed=7))
    g = GoldenCBNet(layers)
    for frame in video.clip(4):
        out = g(frame)
        assert np.array_equal(out, g.dense(frame)), "tau=0 must be bit-exact"
    stem = g.states[0]
    assert stem.changed_out < stem.total_out, "later frames must skip work"


def test_readme_convert_scan_flow_matches_dense():
    video = SpriteVideo(SpriteVideoConfig(height=48, width=64, n_sprites=2,
                                          sprite_size=12, seed=7))
    clip = jnp.asarray(video.clip(4))
    mspecs = get_model("scene", num_classes=4, width=16)
    cfg = PipelineConfig(tile=TileConfig(8, 8), backend="jnp")
    net = convert(mspecs, (48, 64, 3), cfg)
    params = init_params(mspecs, (48, 64, 3), jax.random.PRNGKey(0))
    taus = jnp.full((num_cb_layers(net.specs),), 0.02, jnp.float32)
    ys, _, stats = scan_video(net, params, clip, thresholds=taus)
    dense = jnp.stack([net.apply_dense(params, f) for f in clip])
    agree = float(jnp.mean(jnp.argmax(ys, -1) == jnp.argmax(dense, -1)))
    assert ys.shape == dense.shape
    assert agree > 0.99, f"argmax agreement vs dense {agree}"
    # the always-on stats channel must report per-layer sparsity (C20):
    # after the frame-0 cold start, some layer recomputes fewer tiles
    # than it did on frame 0.
    assert any(int(np.asarray(s["changed_tiles"])[1:].min())
               < int(np.asarray(s["changed_tiles"])[0]) for s in stats)


def _zoo_names():
    from cbinfer_tpu import zoo
    return zoo.names()


@pytest.mark.parametrize("name", _zoo_names())
def test_readme_zoo_flow_loads_and_runs(name):
    from cbinfer_tpu import zoo
    wl = zoo.load(name, (48, 64, 3))  # tiny twin of the shipped workload
    video = SpriteVideo(SpriteVideoConfig(height=48, width=64, n_sprites=2,
                                          sprite_size=12, seed=3))
    clip = jnp.asarray(video.clip(3))
    ys, _, _ = scan_video(wl.net, wl.params, clip,
                          thresholds=jnp.asarray(wl.taus))
    assert ys.shape[0] == 3 and np.isfinite(np.asarray(ys)).all()
