"""Pallas kernel correctness vs jnp backend + golden (SURVEY.md §4 test 1).

Runs in interpreter mode on CPU so CI never needs the TPU; the same code
compiles with Mosaic on device (exercised by bench / TPU smoke scripts).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cbinfer_tpu import golden
from cbinfer_tpu.config import ConvSpec, PipelineConfig, PoolSpec, TileConfig
from cbinfer_tpu.layers import cb_conv_apply, cb_layer_init, cb_pool_apply
from cbinfer_tpu.ops.geometry import conv_tile_geometry
from cbinfer_tpu.ops.compact import compact_mask
from cbinfer_tpu.ops.delta_conv import delta_conv_jnp
from cbinfer_tpu.ops.pallas.delta_conv import delta_conv_pallas
from cbinfer_tpu.ops.pallas.delta_pool import delta_pool_pallas
from cbinfer_tpu.ops.delta_pool import delta_pool_jnp
from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig


def _pallas_cfg(th=8, tw=8, cap=1.0):
    return PipelineConfig(tile=TileConfig(tile_h=th, tile_w=tw,
                                          capacity_fraction=cap),
                          backend="pallas", interpret=True)


@pytest.mark.parametrize("stride,k,cin,cout,dilation", [
    ((1, 1), 3, 8, 16, (1, 1)),
    ((1, 1), 1, 8, 8, (1, 1)),
    ((2, 2), 3, 8, 16, (1, 1)),
    ((1, 1), 5, 4, 8, (1, 1)),
    ((1, 1), 3, 8, 16, (2, 2)),   # seg model's dilated context conv shape
    ((1, 1), 3, 4, 8, (3, 3)),
    ((1, 1), 3, 128, 128, (1, 1)),  # realistic MXU-width channels
])
def test_delta_conv_pallas_matches_jnp(stride, k, cin, cout, dilation):
    rng = np.random.default_rng(0)
    H, W = 32, 48
    g = conv_tile_geometry((H, W, cin), (k, k), stride, dilation, "SAME",
                           8, 8)
    xp = jnp.asarray(rng.standard_normal(g.store_shape).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))
    out0 = jnp.asarray(rng.standard_normal(
        (g.out_h_pad, g.out_w_pad, cout)).astype(np.float32))
    # a strict subset of tiles, unordered coverage of edges
    mask = np.zeros((g.tiles_h, g.tiles_w), bool)
    mask.flat[[0, 3, g.n_tiles - 1, g.n_tiles // 2]] = True
    comp = compact_mask(jnp.asarray(mask), g.n_tiles)

    y_ref = delta_conv_jnp(xp, comp.idx, w, b, out0, g, "relu")
    y_pal = delta_conv_pallas(xp, comp.idx, w, b, out0, g, "relu",
                              count=comp.count, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               atol=1e-5)
    # untouched tiles must be bit-identical to the original cache
    untouched = ~mask
    ref_tiled = np.asarray(y_pal).reshape(g.tiles_h, g.th, g.tiles_w, g.tw,
                                          cout).transpose(0, 2, 1, 3, 4)
    out0_tiled = np.asarray(out0).reshape(g.tiles_h, g.th, g.tiles_w, g.tw,
                                          cout).transpose(0, 2, 1, 3, 4)
    np.testing.assert_array_equal(ref_tiled[untouched], out0_tiled[untouched])


def test_delta_conv_pallas_count_zero_is_noop():
    rng = np.random.default_rng(1)
    g = conv_tile_geometry((16, 16, 8), (3, 3), (1, 1), (1, 1), "SAME", 8, 8)
    xp = jnp.asarray(rng.standard_normal(g.store_shape).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)).astype(np.float32))
    out0 = jnp.asarray(rng.standard_normal((16, 16, 8)).astype(np.float32))
    idx = jnp.full((4,), g.n_tiles, jnp.int32)
    y = delta_conv_pallas(xp, idx, w, None, out0, g, None,
                          count=jnp.asarray(0, jnp.int32), interpret=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(out0))


def test_delta_pool_pallas_matches_jnp():
    rng = np.random.default_rng(2)
    H, W, C = 32, 48, 8
    g = conv_tile_geometry((H, W, C), (2, 2), (2, 2), (1, 1), "VALID", 8, 8)
    xp = jnp.asarray(rng.standard_normal(g.store_shape).astype(np.float32))
    out0 = jnp.asarray(rng.standard_normal(
        (g.out_h_pad, g.out_w_pad, C)).astype(np.float32))
    mask = np.zeros((g.tiles_h, g.tiles_w), bool)
    mask.flat[[1, g.n_tiles - 1]] = True
    comp = compact_mask(jnp.asarray(mask), g.n_tiles)
    y_ref = delta_pool_jnp(xp, comp.idx, out0, g)
    y_pal = delta_pool_pallas(xp, comp.idx, out0, g, count=comp.count,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(y_pal), np.asarray(y_ref))


def test_pallas_backend_layer_matches_golden():
    """Whole CB conv layer with backend='pallas' (interpret) vs golden."""
    rng = np.random.default_rng(3)
    w = rng.standard_normal((3, 3, 3, 8)).astype(np.float32) * 0.2
    b = rng.standard_normal((8,)).astype(np.float32) * 0.1
    spec = ConvSpec(features=8, threshold=0.02)
    cfg = _pallas_cfg()
    H, W = 32, 48
    video = SpriteVideo(SpriteVideoConfig(height=H, width=W, n_sprites=2,
                                          sprite_size=6, noise_std=0.004,
                                          seed=4))
    jst = cb_layer_init(spec, (H, W, 3), cfg)
    gst = golden.GoldenLayerState()
    step = jax.jit(lambda s, x: cb_conv_apply((w, b), s, x, spec, cfg))
    for frame in video.frames(4):
        yj, jst, stats, _ = step(jst, jnp.asarray(frame))
        yg, gst = golden.cb_conv_step(frame, w, b, spec, gst)
        np.testing.assert_allclose(np.asarray(yj.crop() if hasattr(yj, 'crop') else yj), yg, atol=2e-4)


def test_pallas_backend_pool_layer_matches_golden():
    spec = PoolSpec(window=(2, 2), stride=(2, 2), threshold=0.03)
    cfg = _pallas_cfg()
    video = SpriteVideo(SpriteVideoConfig(height=32, width=48, seed=5))
    jst = cb_layer_init(spec, (32, 48, 3), cfg)
    gst = golden.GoldenLayerState()
    step = jax.jit(lambda s, x: cb_pool_apply(s, x, spec, cfg))
    for frame in video.frames(4):
        yj, jst, _, _ = step(jst, jnp.asarray(frame))
        yg, gst = golden.cb_pool_step(frame, spec, gst)
        np.testing.assert_allclose(np.asarray(yj.crop() if hasattr(yj, 'crop') else yj), yg, atol=1e-6)


def test_sparse_detect_chain_matches_golden():
    """Multi-layer pallas net (interpret) with dirty-hint sparse detection:
    values must match golden exactly despite the conservative tile masks."""
    from cbinfer_tpu.convert import convert
    rng = np.random.default_rng(7)
    w1 = rng.standard_normal((3, 3, 3, 8)).astype(np.float32) * 0.2
    b1 = rng.standard_normal((8,)).astype(np.float32) * 0.1
    w2 = rng.standard_normal((3, 3, 8, 8)).astype(np.float32) * 0.2
    b2 = rng.standard_normal((8,)).astype(np.float32) * 0.1
    specs = [
        ConvSpec(features=8, threshold=0.02),
        PoolSpec(threshold=0.02),
        ConvSpec(features=8, threshold=0.02),
    ]
    params = [(jnp.asarray(w1), jnp.asarray(b1)), None,
              (jnp.asarray(w2), jnp.asarray(b2))]
    net = convert(specs, (32, 48, 3), _pallas_cfg())
    gnet = golden.GoldenCBNet([(specs[0], (w1, b1)), (specs[1], None),
                               (specs[2], (w2, b2))])
    state = net.init_state()
    step = jax.jit(net.apply)
    video = SpriteVideo(SpriteVideoConfig(height=32, width=48, n_sprites=2,
                                          seed=8))
    saw_sparse = False
    for t, frame in enumerate(video.frames(4)):
        y, state, stats = step(params, state, jnp.asarray(frame))
        yg = gnet(frame)
        np.testing.assert_allclose(np.asarray(y), yg, atol=5e-4,
                                   err_msg=f"frame {t}")
        # layers after the first must report hint-bounded detection:
        # layer 1's input is 32x48 -> 4x6 = 24 hint tiles; after the cold
        # start the sprites are localized, so detection must be sparse.
        if t > 0:
            assert int(stats[1]["detect_tiles"]) < 24
            saw_sparse = True
    assert saw_sparse


def test_mixed_backend_chain_matches_golden():
    """Layer 0 on the jnp path (cin=3) feeding pallas layers via hints."""
    from cbinfer_tpu.convert import convert
    rng = np.random.default_rng(9)
    w1 = rng.standard_normal((3, 3, 3, 8)).astype(np.float32) * 0.2
    w2 = rng.standard_normal((3, 3, 8, 8)).astype(np.float32) * 0.2
    specs = [
        ConvSpec(features=8, threshold=0.02, use_bias=False),
        ConvSpec(features=8, threshold=0.02, use_bias=False),
    ]
    params = [(jnp.asarray(w1), None), (jnp.asarray(w2), None)]
    net = convert(specs, (32, 48, 3), _pallas_cfg(),
                  backend_overrides={0: "jnp"})
    assert net.specs[0].backend == "jnp"
    gnet = golden.GoldenCBNet([(specs[0], (w1, None)), (specs[1], (w2, None))])
    state = net.init_state()
    assert state[0].in_cache.shape[-1] == 3      # jnp layer: no lane padding
    assert state[1].in_cache.shape[-1] == 128    # pallas layer: padded
    step = jax.jit(net.apply)
    video = SpriteVideo(SpriteVideoConfig(height=32, width=48, n_sprites=2,
                                          seed=10))
    for frame in video.frames(4):
        y, state, stats = step(params, state, jnp.asarray(frame))
        yg = gnet(frame)
        np.testing.assert_allclose(np.asarray(y), yg, atol=5e-4)


def test_detect_full_pallas_matches_xla():
    """Banded full-map fused detect vs the XLA detect + reduce_window path."""
    from cbinfer_tpu.ops.pallas.detect import detect_full_pallas
    from cbinfer_tpu.ops import detect as xdetect
    from cbinfer_tpu.ops.delta_conv import make_storage, storage_interior
    rng = np.random.default_rng(11)
    H, W, C = 32, 48, 8
    g = conv_tile_geometry((H, W, C), (3, 3), (1, 1), (1, 1), "SAME", 8, 8)
    prev = rng.standard_normal((H, W, C)).astype(np.float32)
    x = prev.copy()
    x[5:11, 9:14] += 1.0  # a changed block
    x = jnp.asarray(x)
    st = make_storage(g, 0.0, 0.0, jnp.float32)
    from cbinfer_tpu.ops.delta_conv import storage_update_interior
    st = storage_update_interior(st, jnp.asarray(prev), g)
    st2, maskf, npix = detect_full_pallas(x, st, 0.5, g, interpret=True)
    # XLA reference
    ref_cache, changed = xdetect.detect_and_update(x, jnp.asarray(prev), 0.5)
    ref_mask = xdetect.changed_tile_mask(changed, g)
    np.testing.assert_array_equal(np.asarray(maskf) > 0.5, np.asarray(ref_mask))
    np.testing.assert_array_equal(
        np.asarray(storage_interior(st2, g)), np.asarray(ref_cache))
    assert int(npix[0]) == int(np.asarray(changed).sum()) > 0


def test_detect_pool_fused_matches_dense_pool():
    """Hint-forwarded pool (detect_pool_fused): hinted blocks equal the
    dense pool of the current input; unhinted blocks keep the old cache
    bit-identically; the emitted mask marks exactly the touched out
    tiles."""
    from cbinfer_tpu.ops.pallas.delta_pool import detect_pool_fused

    rng = np.random.default_rng(3)
    H, W, C, BH, BW, P = 32, 64, 128, 8, 16, 2
    g = conv_tile_geometry((H, W, C), (P, P), (P, P), (1, 1), "VALID", 8, 8)
    x = jnp.asarray(rng.standard_normal((H, W, C)).astype(np.float32))
    old = jnp.asarray(rng.standard_normal(
        (g.out_h_pad, g.out_w_pad, C)).astype(np.float32))

    # dirty blocks on the paired (H/8, W/16) grid
    block_mask = np.zeros((H // BH, W // BW), bool)
    block_mask[0, 0] = block_mask[2, 2] = block_mask[3, 3] = True
    comp = compact_mask(jnp.asarray(block_mask), block_mask.size)
    new, maskf = detect_pool_fused(x, old, comp.idx, comp.count, g,
                                   hint_h=BH, hint_w=BW, interpret=True)

    # dense pool oracle
    ref = np.asarray(x).reshape(H // P, P, W // P, P, C).max((1, 3))
    new_np = np.asarray(new)
    touched = np.zeros((g.out_h_pad, g.out_w_pad), bool)
    for hi in range(H // BH):
        for hj in range(W // BW):
            oy, ox = hi * BH // P, hj * BW // P
            blk = (slice(oy, oy + BH // P), slice(ox, ox + BW // P))
            if block_mask[hi, hj]:
                np.testing.assert_allclose(new_np[blk], ref[blk], atol=1e-6)
                touched[blk] = True
            else:
                np.testing.assert_array_equal(new_np[blk],
                                              np.asarray(old)[blk])
    # mask == out tiles overlapping any touched block
    want = touched.reshape(g.tiles_h, g.th, g.tiles_w, g.tw).any((1, 3))
    np.testing.assert_array_equal(np.asarray(maskf) > 0.5, want)


def test_forward_hint_pool_layer_matches_redetect():
    """A forward_hint pool inside the layer chain produces the same values
    as the re-detection pool at tau=0 (superset recompute, same math)."""
    import dataclasses as dc
    from cbinfer_tpu.convert import convert
    from cbinfer_tpu.models import get_model
    from cbinfer_tpu.network import init_params
    from cbinfer_tpu.runner import scan_video

    H, W = 32, 64
    specs = get_model("scene_tiny", num_classes=5, width=16)
    cfg = _pallas_cfg(th=8, tw=8)
    base = convert(specs, (H, W, 3), cfg,
                   backend_overrides={0: "dense_cached"},
                   thresholds=[0.02, 0.0, 0.02, 0.02])
    fwd_specs = tuple(
        dc.replace(s, forward_hint=True) if isinstance(s, PoolSpec) else s
        for s in base.specs)
    fwd = dc.replace(base, specs=fwd_specs)
    params = init_params(specs, (H, W, 3), jax.random.PRNGKey(0))
    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=1, sprite_size=8, noise_std=0.002,
        seed=7)).clip(5))
    ys_f, _, st_f = scan_video(fwd, params, clip)
    ys_r, _, st_r = scan_video(base, params, clip)
    # pool at tau=0 re-detects every hinted change -> same values
    np.testing.assert_allclose(np.asarray(ys_f), np.asarray(ys_r),
                               atol=1e-5)
    # the forwarded pool never inspects pixels outside the hint
    pf = [s for s in st_f if s][1]
    assert np.all(np.asarray(pf["detect_tiles"])[1:]
                  < np.max(np.asarray(pf["n_tiles"])))


def test_detect_sparse_clamped_edge_count_exact():
    """Clamped bottom-edge hint tiles overlap the previous tile's rows;
    npix must count each changed pixel exactly once (nominal-row
    ownership), not once-or-twice depending on DMA timing."""
    from cbinfer_tpu.ops.pallas.detect import detect_sparse
    from cbinfer_tpu.ops.delta_conv import make_storage, \
        storage_update_interior, storage_interior

    rng = np.random.default_rng(17)
    H, W, C = 20, 16, 8  # H % 8 != 0 -> tile row 2 clamps to oy=12
    g = conv_tile_geometry((H, W, C), (3, 3), (1, 1), (1, 1), "SAME", 8, 8)
    prev = rng.standard_normal((H, W, C)).astype(np.float32)
    x = prev.copy()
    x[10:18, 2:9] += 1.0  # changes straddle the overlap rows 12..16
    st = make_storage(g, 0.0, 0.0, jnp.float32)
    st = storage_update_interior(st, jnp.asarray(prev), g)
    hint = np.ones((-(-H // 8), W // 8), bool)  # all hint tiles dirty
    comp = compact_mask(jnp.asarray(hint), hint.size)
    st2, maskf, npix = detect_sparse(jnp.asarray(x), st, 0.5, comp.idx,
                                     comp.count, g, interpret=True)
    exact = int((np.abs(x - prev).max(-1) > 0.5).sum())
    assert int(npix[0]) == exact > 0
    # cache: changed pixels accepted, others untouched
    got = np.asarray(storage_interior(st2, g))
    want = np.where((np.abs(x - prev).max(-1) > 0.5)[..., None], x, prev)
    np.testing.assert_allclose(got, want, atol=0)
