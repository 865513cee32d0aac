"""Golden per-pixel reference semantics (SURVEY.md C12, §4 test 2).

These tests pin down the CBinfer algorithm's exact semantics before any JAX
code exists: tau=0 equivalence with dense, the accepted-value cache-update
rule, the out_cache == conv(in_cache) invariant, and bounded drift.
"""

import numpy as np
import pytest

from cbinfer_tpu.config import ConvSpec, PoolSpec
from cbinfer_tpu import golden
from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig, two_frame_pair


def _rand_conv(rng, cin, cout, k=3, **kw):
    w = rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.2
    b = rng.standard_normal((cout,)).astype(np.float32) * 0.1
    return w, b, ConvSpec(features=cout, kernel=(k, k), **kw)


def test_dense_conv_matches_manual():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 7, 3)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 4)).astype(np.float32)
    b = rng.standard_normal((4,)).astype(np.float32)
    y = golden.dense_conv2d(x, w, b, (1, 1), (1, 1), "VALID", None)
    # brute-force check one output pixel
    i, j = 1, 2
    acc = b.astype(np.float64).copy()
    for dy in range(3):
        for dx in range(3):
            acc += x[i + dy, j + dx].astype(np.float64) @ w[dy, dx]
    np.testing.assert_allclose(y[i, j], acc, rtol=1e-5)


@pytest.mark.parametrize("stride,padding,dilation", [
    ((1, 1), "SAME", (1, 1)),
    ((2, 2), "SAME", (1, 1)),
    ((1, 1), "VALID", (1, 1)),
    ((1, 1), "SAME", (2, 2)),
])
def test_tau_zero_equals_dense(stride, padding, dilation):
    """tau=0 CB inference reproduces dense inference exactly on every frame."""
    rng = np.random.default_rng(1)
    w, b, _ = _rand_conv(rng, 3, 8)
    spec = ConvSpec(features=8, kernel=(3, 3), stride=stride, padding=padding,
                    dilation=dilation, threshold=0.0)
    video = SpriteVideo(SpriteVideoConfig(height=24, width=32, seed=2))
    state = golden.GoldenLayerState()
    for frame in video.frames(5):
        y_cb, state = golden.cb_conv_step(frame, w, b, spec, state)
        y_dense = golden.dense_conv2d(frame, w, b, stride, dilation, padding, "relu")
        np.testing.assert_array_equal(y_cb, y_dense)


def test_cache_update_rule_accepted_value():
    """The comparison baseline is the last ACCEPTED value: sub-threshold drift
    does not update the cache, and accumulated drift eventually triggers."""
    spec = ConvSpec(features=1, kernel=(1, 1), threshold=0.5, activation=None,
                    use_bias=False)
    w = np.ones((1, 1, 1, 1), dtype=np.float32)
    x0 = np.zeros((1, 1, 1), dtype=np.float32)
    state = golden.GoldenLayerState()
    y, state = golden.cb_conv_step(x0, w, None, spec, state)  # cold start
    # drift +0.3 -> below tau: cache must NOT update, output stays 0
    y, state = golden.cb_conv_step(x0 + 0.3, w, None, spec, state)
    assert state.in_cache[0, 0, 0] == 0.0
    assert y[0, 0, 0] == 0.0
    assert state.changed_in == 0
    # another +0.3 (total drift 0.6 > tau vs ACCEPTED value 0.0) -> triggers
    y, state = golden.cb_conv_step(x0 + 0.6, w, None, spec, state)
    assert state.in_cache[0, 0, 0] == np.float32(0.6)
    assert y[0, 0, 0] == np.float32(0.6)
    assert state.changed_in == 1


def test_out_cache_invariant():
    """out_cache == conv(in_cache) at every pixel after every frame."""
    rng = np.random.default_rng(3)
    w, b, _ = _rand_conv(rng, 3, 4)
    spec = ConvSpec(features=4, threshold=0.05)
    video = SpriteVideo(SpriteVideoConfig(height=24, width=32, noise_std=0.01,
                                          seed=4))
    state = golden.GoldenLayerState()
    for frame in video.frames(6):
        _, state = golden.cb_conv_step(frame, w, b, spec, state)
        expect = golden.dense_conv2d(state.in_cache, w, b, spec.stride,
                                     spec.dilation, spec.padding, spec.activation)
        np.testing.assert_array_equal(state.out_cache, expect)


def test_two_frame_pair_sparsity():
    """configs[0]: small moved region => small recompute region, exact values
    at recomputed pixels, bounded error elsewhere."""
    f0, f1 = two_frame_pair(h=24, w=32, moved_pixels=36)
    rng = np.random.default_rng(5)
    w, b, _ = _rand_conv(rng, 3, 8)
    spec = ConvSpec(features=8, threshold=1e-6)
    state = golden.GoldenLayerState()
    _, state = golden.cb_conv_step(f0, w, b, spec, state)
    y, state = golden.cb_conv_step(f1, w, b, spec, state)
    # moved 6x6 region dilated by 3x3 kernel -> at most 8x8 = 64 outputs
    assert 0 < state.changed_out <= 64
    y_dense = golden.dense_conv2d(f1, w, b, spec.stride, spec.dilation,
                                  spec.padding, spec.activation)
    np.testing.assert_allclose(y, y_dense, atol=1e-5)


def test_cb_pool_tau_zero_equals_dense():
    video = SpriteVideo(SpriteVideoConfig(height=24, width=32, seed=6))
    spec = PoolSpec(window=(2, 2), stride=(2, 2), threshold=0.0)
    state = golden.GoldenLayerState()
    for frame in video.frames(4):
        y_cb, state = golden.cb_pool_step(frame, spec, state)
        np.testing.assert_array_equal(
            y_cb, golden.dense_maxpool2d(frame, (2, 2), (2, 2), "VALID"))


def test_network_chain_tau_zero():
    """Whole-net CB chain at tau=0 == dense forward, incl. pooling."""
    rng = np.random.default_rng(7)
    w1, b1, _ = _rand_conv(rng, 3, 8)
    w2, b2, _ = _rand_conv(rng, 8, 8)
    net = golden.GoldenCBNet([
        (ConvSpec(features=8, threshold=0.0), (w1, b1)),
        (PoolSpec(window=(2, 2), stride=(2, 2), threshold=0.0), None),
        (ConvSpec(features=8, threshold=0.0), (w2, b2)),
    ])
    video = SpriteVideo(SpriteVideoConfig(height=24, width=32, seed=8))
    for frame in video.frames(4):
        y_cb = net(frame)
        y_dense = net.dense(frame)
        np.testing.assert_array_equal(y_cb, y_dense)


def test_drift_bounded_by_threshold():
    """With per-pixel noise below tau, in_cache error stays <= tau (per channel
    deviation bounded by the acceptance rule) and never grows unboundedly."""
    video = SpriteVideo(SpriteVideoConfig(height=16, width=16, n_sprites=0,
                                          noise_std=0.005, seed=9))
    spec = ConvSpec(features=4, threshold=0.05)
    rng = np.random.default_rng(10)
    w, b, _ = _rand_conv(rng, 3, 4)
    state = golden.GoldenLayerState()
    for frame in video.frames(10):
        _, state = golden.cb_conv_step(frame, w, b, spec, state)
        err = np.max(np.abs(frame - state.in_cache))
        assert err <= spec.threshold + 1e-6


def test_golden_geometry_twins_match_pipeline_geometry():
    """golden.py reimplements padding/size geometry independently of
    ops/geometry.py (oracle independence); the twins must agree across a
    shape sweep so neither can silently drift."""
    from cbinfer_tpu import golden as g
    from cbinfer_tpu.ops import geometry as og

    for n in (7, 8, 15, 16, 31, 97):
        for k in (1, 2, 3, 5):
            for s in (1, 2, 3):
                for d in (1, 2):
                    for pad in ("SAME", "VALID", (0, 0), (1, 1), (2, 2)):
                        p0 = g.pad_dim(pad, 0)
                        assert p0 == og.pad_dim(pad, 0)
                        assert g.conv_out_size(n, k, s, d, p0) == \
                            og.conv_out_size(n, k, s, d, p0), \
                            (n, k, s, d, pad)
                        assert g.conv_pads(n, k, s, d, p0) == \
                            og.conv_pads(n, k, s, d, p0), (n, k, s, d, pad)


def test_golden_bf16_cache_parity_with_pipeline():
    """With cache_dtype='bfloat16' the golden oracle quantizes ACCEPTED
    values like the pipeline's caches, so detection masks stay identical
    even when sub-threshold drift straddles bf16 rounding (a
    full-precision golden accept diverges here — the exact case the
    quantize_cache doc describes)."""
    import jax
    import jax.numpy as jnp
    from cbinfer_tpu import golden as g
    from cbinfer_tpu.config import ConvSpec, PipelineConfig, TileConfig
    from cbinfer_tpu.convert import convert
    from cbinfer_tpu.network import init_params
    from cbinfer_tpu.runner import scan_video

    rng = np.random.default_rng(29)
    H, W, C, T = 16, 16, 3, 6
    tau = 0.004  # near bf16 ulp at O(1) values: rounding decides masks
    base = rng.random((H, W, C)).astype(np.float32) * 0.5 + 0.5
    frames = np.stack([base + 0.0017 * t * rng.random((H, W, C)
                                                      ).astype(np.float32)
                       for t in range(T)])
    spec = ConvSpec(features=8, threshold=tau)
    params = init_params([spec], (H, W, C), jax.random.PRNGKey(0))
    cfg = PipelineConfig(tile=TileConfig(4, 4), backend="jnp",
                         compute_dtype="float32", cache_dtype="bfloat16")
    net = convert([spec], (H, W, C), cfg)
    _, _, stats = scan_video(net, params, jnp.asarray(frames),
                             thresholds=jnp.asarray([tau]))
    w, b = params[0]
    gnet = g.GoldenCBNet([(spec, (np.asarray(w), np.asarray(b)))],
                         cache_dtype="bfloat16")
    golden_changed = []
    for t in range(T):
        gnet(frames[t])
        golden_changed.append(gnet.states[0].changed_in)
    pipe_changed = np.asarray(stats[0]["changed_pixels"])
    # frame 0 counts full-frame on both sides; later frames must agree
    # exactly — only possible if both quantize accepts identically
    np.testing.assert_array_equal(pipe_changed[1:],
                                  np.asarray(golden_changed[1:]))
    assert any(0 < c < H * W for c in golden_changed[1:])  # non-trivial
