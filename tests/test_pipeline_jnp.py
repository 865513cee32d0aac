"""Tile pipeline (jnp backend) vs golden per-pixel reference (SURVEY.md §4
tests 1-3 and §3.5 configs[0] golden check).

Because detection stays per-pixel and recompute is value-exact per the
out_cache == f(in_cache) invariant, the tiled pipeline must match the golden
model to fp32 tolerance at EVERY pixel — not just conservative-superset
agreement. Also checks the exact-minimal-tile-count property and the
capacity-overflow dense fallback.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cbinfer_tpu import golden
from cbinfer_tpu.config import ConvSpec, PipelineConfig, PoolSpec, TileConfig
from cbinfer_tpu.convert import convert
from cbinfer_tpu.layers import cb_conv_apply, cb_layer_init, cb_pool_apply
from cbinfer_tpu.network import dense_apply, init_params
from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig, two_frame_pair


def _cfg(th=4, tw=4, cap=1.0, backend="jnp"):
    return PipelineConfig(tile=TileConfig(tile_h=th, tile_w=tw,
                                          capacity_fraction=cap),
                          backend=backend)


def _rand_conv(rng, cin, cout, k=3, **kw):
    w = rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.2
    b = rng.standard_normal((cout,)).astype(np.float32) * 0.1
    return w, b, ConvSpec(features=cout, kernel=(k, k), **kw)


@pytest.mark.parametrize("stride,padding,dilation,k", [
    ((1, 1), "SAME", (1, 1), 3),
    ((2, 2), "SAME", (1, 1), 3),
    ((1, 1), "VALID", (1, 1), 5),
    ((1, 1), "SAME", (2, 2), 3),
    ((2, 2), "SAME", (1, 1), 1),
])
def test_conv_layer_matches_golden(stride, padding, dilation, k):
    rng = np.random.default_rng(0)
    w, b, _ = _rand_conv(rng, 3, 8, k=k)
    spec = ConvSpec(features=8, kernel=(k, k), stride=stride, padding=padding,
                    dilation=dilation, threshold=0.02)
    cfg = _cfg()
    # pick input so output dims divide by tile 4
    H, W = (36, 52) if padding == "VALID" and k == 5 else (
        (32, 48) if stride == (1, 1) else (64, 96))
    video = SpriteVideo(SpriteVideoConfig(height=H, width=W, n_sprites=2,
                                          sprite_size=6, noise_std=0.004,
                                          seed=1))
    jst = cb_layer_init(spec, (H, W, 3), cfg)
    gst = golden.GoldenLayerState()
    step = jax.jit(lambda s, x: cb_conv_apply((w, b), s, x, spec, cfg))
    from cbinfer_tpu.layers import _geometry
    g = _geometry(spec, (H, W, 3), cfg)
    for frame in video.frames(5):
        yj, jst, stats, _ = step(jst, jnp.asarray(frame))
        yg, gst = golden.cb_conv_step(frame, w, b, spec, gst)
        np.testing.assert_allclose(np.asarray(yj.crop() if hasattr(yj, 'crop') else yj), yg, atol=2e-4), (stride, padding)
        interior = np.asarray(jst.in_cache)[
            g.store_lo_h:g.store_lo_h + H, g.store_lo_w:g.store_lo_w + W]
        np.testing.assert_allclose(interior, gst.in_cache, atol=1e-6)


def test_tile_count_is_exact_minimal_cover():
    """changed_tiles == number of tiles containing >=1 golden changed-output
    pixel (no input-side over-approximation; SURVEY.md §7 refinement)."""
    rng = np.random.default_rng(2)
    w, b, _ = _rand_conv(rng, 3, 4)
    spec = ConvSpec(features=4, threshold=0.05)
    cfg = _cfg(th=4, tw=4)
    f0, f1 = two_frame_pair(h=32, w=48, moved_pixels=49, seed=3)
    jst = cb_layer_init(spec, (32, 48, 3), cfg)
    gst = golden.GoldenLayerState()
    _, jst, _, _ = cb_conv_apply((w, b), jst, jnp.asarray(f0), spec, cfg)
    _, gst = golden.cb_conv_step(f0, w, b, spec, gst)
    _, jst, stats, _ = cb_conv_apply((w, b), jst, jnp.asarray(f1), spec, cfg)
    _, gst = golden.cb_conv_step(f1, w, b, spec, gst)
    # golden changed-output pixel map for frame 1:
    changed = golden.propagate_mask(
        np.max(np.abs(f1 - f0), axis=-1) > spec.threshold,
        spec.kernel, spec.stride, spec.dilation, spec.padding)
    tiles = changed.reshape(8, 4, 12, 4).any(axis=(1, 3))
    assert int(stats["changed_tiles"]) == int(tiles.sum()) > 0


def test_capacity_overflow_dense_fallback_is_value_exact():
    """Tiny capacity forces overflow; outputs must still match golden."""
    rng = np.random.default_rng(4)
    w, b, _ = _rand_conv(rng, 3, 8)
    spec = ConvSpec(features=8, threshold=0.02)
    cfg = _cfg(cap=0.3)  # frame 0 (all tiles changed) always overflows
    video = SpriteVideo(SpriteVideoConfig(height=32, width=48, n_sprites=1,
                                          sprite_size=6, seed=5))
    jst = cb_layer_init(spec, (32, 48, 3), cfg)
    gst = golden.GoldenLayerState()
    step = jax.jit(lambda s, x: cb_conv_apply((w, b), s, x, spec, cfg))
    saw_overflow = saw_tile_path = False
    for frame in video.frames(6):
        yj, jst, stats, _ = step(jst, jnp.asarray(frame))
        yg, gst = golden.cb_conv_step(frame, w, b, spec, gst)
        np.testing.assert_allclose(np.asarray(yj.crop() if hasattr(yj, 'crop') else yj), yg, atol=2e-4)
        saw_overflow |= bool(stats["overflow"])
        saw_tile_path |= not bool(stats["overflow"])
    assert saw_overflow and saw_tile_path  # both branches exercised


def test_pool_layer_matches_golden():
    spec = PoolSpec(window=(2, 2), stride=(2, 2), threshold=0.03)
    cfg = _cfg(th=4, tw=4)
    video = SpriteVideo(SpriteVideoConfig(height=32, width=48, noise_std=0.005,
                                          seed=6))
    jst = cb_layer_init(spec, (32, 48, 3), cfg)
    gst = golden.GoldenLayerState()
    step = jax.jit(lambda s, x: cb_pool_apply(s, x, spec, cfg))
    for frame in video.frames(5):
        yj, jst, _, _ = step(jst, jnp.asarray(frame))
        yg, gst = golden.cb_pool_step(frame, spec, gst)
        np.testing.assert_allclose(np.asarray(yj.crop() if hasattr(yj, 'crop') else yj), yg, atol=1e-6)


def test_network_tau0_equals_dense_xla():
    """Full converted net at tau=0 == XLA dense forward on every frame."""
    rng = jax.random.PRNGKey(0)
    specs = [
        ConvSpec(features=8, threshold=0.0),
        PoolSpec(threshold=0.0),
        ConvSpec(features=16, threshold=0.0),
        ConvSpec(features=5, kernel=(1, 1), activation=None, threshold=0.0),
    ]
    params = init_params(specs, (32, 48, 3), rng)
    net = convert(specs, (32, 48, 3), _cfg())
    state = net.init_state()
    video = SpriteVideo(SpriteVideoConfig(height=32, width=48, seed=7))
    step = jax.jit(net.apply)
    for frame in video.frames(4):
        x = jnp.asarray(frame)
        y, state, _ = step(params, state, x)
        yd = dense_apply(specs, params, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yd), atol=2e-4)


def test_network_matches_golden_full_chain():
    """Multi-layer CB propagation (conv+pool chain) matches golden exactly."""
    rng = np.random.default_rng(8)
    w1, b1, _ = _rand_conv(rng, 3, 8)
    w2, b2, _ = _rand_conv(rng, 8, 8)
    specs = [
        ConvSpec(features=8, threshold=0.02),
        PoolSpec(threshold=0.02),
        ConvSpec(features=8, threshold=0.02),
    ]
    params = [(jnp.asarray(w1), jnp.asarray(b1)), None,
              (jnp.asarray(w2), jnp.asarray(b2))]
    net = convert(specs, (32, 48, 3), _cfg())
    gnet = golden.GoldenCBNet([(specs[0], (w1, b1)), (specs[1], None),
                               (specs[2], (w2, b2))])
    state = net.init_state()
    step = jax.jit(net.apply)
    # noise_std=0 on purpose: deep-layer inputs differ between golden (f64
    # conv accumulation) and jnp (f32) by ~1e-7, so sub-threshold noise could
    # flip masks right at the tau boundary. Sprite motion gives diffs that are
    # either exactly 0 or large.
    video = SpriteVideo(SpriteVideoConfig(height=32, width=48, n_sprites=2,
                                          seed=9))
    for frame in video.frames(5):
        y, state, _ = step(params, state, jnp.asarray(frame))
        yg = gnet(frame)
        np.testing.assert_allclose(np.asarray(y), yg, atol=5e-4)


def test_converter_threshold_binding_and_dense_layers():
    specs = [ConvSpec(features=4, threshold=0.0), PoolSpec(),
             ConvSpec(features=4, threshold=0.0)]
    net = convert(specs, (16, 16, 3), _cfg(), thresholds=[0.1, 0.2, 0.3],
                  dense_layers=[2])
    assert net.specs[0].threshold == 0.1
    assert net.specs[1].threshold == 0.2
    assert net.specs[2].threshold == 0.3 and not net.specs[2].use_cb
    state = net.init_state()
    assert state[2] is None  # dense layer holds no cache
    with pytest.raises(ValueError):
        convert(specs, (16, 16, 3), _cfg(), thresholds=[0.1])


def test_non_divisible_output_dims_internal_padding():
    """720p-style non-divisible dims: tile grid rounds up, values match golden."""
    rng = np.random.default_rng(11)
    w, b, _ = _rand_conv(rng, 3, 8)
    spec = ConvSpec(features=8, threshold=0.02)
    cfg = _cfg(th=8, tw=8)
    H, W = 36, 52  # 36/8, 52/8 not integral
    video = SpriteVideo(SpriteVideoConfig(height=H, width=W, n_sprites=2,
                                          sprite_size=6, seed=12))
    jst = cb_layer_init(spec, (H, W, 3), cfg)
    gst = golden.GoldenLayerState()
    step = jax.jit(lambda s, x: cb_conv_apply((w, b), s, x, spec, cfg))
    for frame in video.frames(4):
        yj, jst, _, _ = step(jst, jnp.asarray(frame))
        yj = yj.crop()
        yg, gst = golden.cb_conv_step(frame, w, b, spec, gst)
        assert yj.shape == yg.shape
        np.testing.assert_allclose(np.asarray(yj), yg, atol=2e-4)


def test_mid_layer_dense_cached_pallas_interpret_matches_jnp():
    """A MID-network dense_cached flip (what scripts/optimize_policy.py
    ships via POLICY files) through the PALLAS kernel path: the flipped
    layer's producers/consumers are lane-padded pallas Features with
    dirty hints — a different input contract than the layer-0 stem the
    other dense_cached tests cover. The jnp backend is the oracle."""
    from cbinfer_tpu.runner import scan_video

    specs = [
        ConvSpec(features=8, threshold=0.02),
        PoolSpec(threshold=0.02),
        ConvSpec(features=8, threshold=0.02),
        ConvSpec(features=5, kernel=(1, 1), activation=None,
                 threshold=0.02),
    ]
    in_shape = (16, 24, 3)
    params = init_params(specs, in_shape, jax.random.PRNGKey(3))
    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=16, width=24, seed=11, n_sprites=1, sprite_size=5)).clip(4))
    over = {0: "dense_cached", 2: "dense_cached"}  # stem AND mid layer
    netp = convert(specs, in_shape, PipelineConfig(
        tile=TileConfig(8, 8), backend="pallas", interpret=True),
        backend_overrides=over)
    netj = convert(specs, in_shape, PipelineConfig(
        tile=TileConfig(8, 8), backend="jnp"), backend_overrides=over)
    netj_plain = convert(specs, in_shape, PipelineConfig(
        tile=TileConfig(8, 8), backend="jnp"))
    ysp, stp, _ = scan_video(netp, params, clip)
    ysj, stj, _ = scan_video(netj, params, clip)
    ysn, _, _ = scan_video(netj_plain, params, clip)
    np.testing.assert_allclose(np.asarray(ysp), np.asarray(ysj), atol=1e-5)
    # the flip is accuracy-neutral (superset recompute, same tau
    # semantics): outputs match the no-override net too
    np.testing.assert_allclose(np.asarray(ysp), np.asarray(ysn), atol=1e-5)
    # and the flipped layer's caches agree across backends (logical lanes)
    oc_p = np.asarray(stp[2].out_cache)[..., :8]
    oc_j = np.asarray(stj[2].out_cache)
    np.testing.assert_allclose(oc_p[:oc_j.shape[0], :oc_j.shape[1]], oc_j,
                               atol=1e-5)


def test_elided_pool_in_cache_flagship_pallas():
    """Flagship nets elide the never-read input cache of fused forward
    pools (PoolSpec.elide_in_cache): placeholder state, identical
    streamed values vs the jnp twin, and a working refresh prolog."""
    from cbinfer_tpu.config import PoolSpec as PS
    from cbinfer_tpu.convert import convert_flagship
    from cbinfer_tpu.models import get_model
    from cbinfer_tpu.runner import scan_video
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig

    specs = get_model("scene", num_classes=8, width=16)
    in_shape = (32, 32, 3)
    cfg_p = PipelineConfig(tile=TileConfig(8, 8), backend="pallas",
                           interpret=True)
    cfg_j = PipelineConfig(tile=TileConfig(8, 8), backend="jnp")
    net_p = convert_flagship(specs, in_shape, cfg_p)
    net_j = convert_flagship(specs, in_shape, cfg_j)
    pools_p = [s for s in net_p.specs if isinstance(s, PS)]
    assert pools_p and all(s.elide_in_cache for s in pools_p)
    assert not any(s.elide_in_cache for s in net_j.specs
                   if isinstance(s, PS))
    st = net_p.init_state()
    pool_idx = [i for i, s in enumerate(net_p.specs) if isinstance(s, PS)]
    for i in pool_idx:
        assert st[i].in_cache.shape == (1, 1, 1), st[i].in_cache.shape

    params = init_params(specs, in_shape, jax.random.PRNGKey(4))
    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=32, width=32, seed=21, n_sprites=1, sprite_size=7)).clip(4))
    taus = jnp.full((sum(1 for s in net_p.specs
                         if getattr(s, "use_cb", False)),), 0.02)
    ys_p, _, _ = scan_video(net_p, params, clip, thresholds=taus,
                            refresh_start=True)
    ys_j, _, _ = scan_video(net_j, params, clip, thresholds=taus,
                            refresh_start=True)
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_j),
                               atol=1e-5)
