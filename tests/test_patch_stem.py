"""patch_stem backend: flat4 layout + fused-assembly stem kernel
(SURVEY.md §4 test 1 family; interpreter mode on CPU like the other
Pallas kernel tests — the same code compiles with Mosaic on device and
is exercised by bench/probe scripts there)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cbinfer_tpu import network as net
from cbinfer_tpu.config import ConvSpec, PipelineConfig, TileConfig
from cbinfer_tpu.convert import flagship_layers
from cbinfer_tpu.layers import (CBLayerState, cb_conv_apply,
                                cb_conv_refresh, cb_layer_init)
from cbinfer_tpu.ops import flat4
from cbinfer_tpu.ops.compact import compact_mask
from cbinfer_tpu.ops.detect import COLD_START_FILL, detect_and_update
from cbinfer_tpu.ops.pallas.patch_stem import patch_stem_conv

H, W, CIN, COUT = 16, 64, 3, 8


def _cfg(cap=1.0):
    return PipelineConfig(tile=TileConfig(capacity_fraction=cap),
                          backend="pallas", interpret=True)


def _spec(activation="relu"):
    return ConvSpec(features=COUT, kernel=(3, 3), stride=(1, 1),
                    dilation=(1, 1), padding="SAME", activation=activation,
                    backend="patch_stem")


def _wb(rng, cout=COUT):
    w = jnp.asarray(rng.standard_normal((3, 3, CIN, cout)), jnp.float32) * .2
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    return w, b


def test_flat4_roundtrip_and_margins():
    rng = np.random.default_rng(0)
    fg = flat4.flat4_geom(H, W, CIN)
    x = jnp.asarray(rng.standard_normal((H, W, CIN)), jnp.float32)
    f4 = flat4.to_flat4(x, fg, jnp.float32)
    assert f4.shape == (fg.fh, fg.fl)
    np.testing.assert_array_equal(np.asarray(flat4.from_flat4(f4, fg)),
                                  np.asarray(x))
    # margins and c>=cin slots are zero
    v = np.asarray(f4).reshape(fg.fh, fg.fl // flat4.CP, flat4.CP)
    assert v[0].max() == 0 and v[1 + H:].max() == 0
    assert v[:, 0].max() == 0 and v[:, 1 + W:].max() == 0
    assert np.abs(v[..., CIN:]).max() == 0


@pytest.mark.parametrize("cache_dtype", [jnp.float32, jnp.bfloat16])
def test_detect_accept_matches_reference_semantics(cache_dtype):
    """Per-pixel accept on flat4 == detect.detect_and_update on HWC —
    including with a bf16 cache, where the tau comparison must run on the
    UNROUNDED input (borderline pixels flip otherwise)."""
    rng = np.random.default_rng(1)
    fg = flat4.flat4_geom(H, W, CIN)
    prev = jnp.asarray(rng.standard_normal((H, W, CIN)),
                       jnp.float32).astype(cache_dtype)
    x = prev.astype(jnp.float32) + jnp.asarray(
        rng.standard_normal((H, W, CIN)) * (rng.random((H, W, CIN)) > .9),
        jnp.float32) * 0.1
    tau = 0.05
    ref_cache, ref_changed = detect_and_update(x, prev, tau)
    c4 = flat4.to_flat4(prev, fg, cache_dtype)
    new4, changed, n_pix = flat4.detect_accept_flat4(x, c4, tau, fg)
    np.testing.assert_array_equal(np.asarray(changed),
                                  np.asarray(ref_changed))
    np.testing.assert_array_equal(
        np.asarray(flat4.from_flat4(new4, fg)).astype(np.float32),
        np.asarray(ref_cache).astype(np.float32))
    assert int(n_pix) == int(jnp.sum(ref_changed))


@pytest.mark.parametrize("activation", ["relu", None])
def test_kernel_matches_dense_conv_all_tiles(activation):
    rng = np.random.default_rng(2)
    fg = flat4.flat4_geom(H, W, CIN)
    spec = dataclasses.replace(_spec(activation), backend=None)
    x = jnp.asarray(rng.standard_normal((H, W, CIN)), jnp.float32)
    w, b = _wb(rng)
    cout_pad = 128
    f4 = flat4.to_flat4(x, fg, jnp.float32)
    idx = jnp.arange(fg.tiles_h * fg.tiles_w, dtype=jnp.int32)
    cnt = jnp.asarray(idx.shape[0], jnp.int32)
    out0 = jnp.zeros((H, W, cout_pad), jnp.float32)
    y = patch_stem_conv(f4, idx, cnt, w, b, out0, fg, activation,
                        jnp.float32, interpret=True)
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, cout_pad - COUT)))
    bp = jnp.pad(b, (0, cout_pad - COUT))
    y_ref = net.dense_conv(x, wp, bp, spec, jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


def test_kernel_partial_update_preserves_untouched_tiles():
    rng = np.random.default_rng(3)
    fg = flat4.flat4_geom(H, W, CIN)
    x = jnp.asarray(rng.standard_normal((H, W, CIN)), jnp.float32)
    w, b = _wb(rng)
    f4 = flat4.to_flat4(x, fg, jnp.float32)
    n_tiles = fg.tiles_h * fg.tiles_w
    mask = np.zeros((fg.tiles_h, fg.tiles_w), bool)
    mask.flat[[0, n_tiles - 1]] = True
    comp = compact_mask(jnp.asarray(mask), n_tiles)
    sentinel = jnp.full((H, W, 128), 7.0, jnp.float32)
    y = patch_stem_conv(f4, comp.idx, comp.count, w, b, sentinel, fg,
                        "relu", jnp.float32, interpret=True)
    y_all = patch_stem_conv(f4, jnp.arange(n_tiles, dtype=jnp.int32),
                            jnp.asarray(n_tiles, jnp.int32), w, b,
                            jnp.zeros_like(sentinel), fg, "relu",
                            jnp.float32, interpret=True)
    yn = np.asarray(y)
    for t in range(n_tiles):
        ti, tj = divmod(t, fg.tiles_w)
        blk = yn[ti * 8:ti * 8 + 8, tj * 32:tj * 32 + 32]
        if mask.flat[t]:
            np.testing.assert_array_equal(
                blk, np.asarray(y_all)[ti * 8:ti * 8 + 8,
                                       tj * 32:tj * 32 + 32])
        else:
            np.testing.assert_array_equal(blk, 7.0)


def _run_frames(spec, cfg, frames, w, b, tau):
    state = cb_layer_init(spec, (H, W, CIN), cfg)
    outs = []
    for f in frames:
        y, state, stats, hint = cb_conv_apply((w, b), state, f, spec, cfg,
                                              tau=tau)
        outs.append(np.asarray(y.crop()))
    return outs, state, stats, hint


def test_layer_stream_matches_dense_cached_backend():
    """Same video through patch_stem and dense_cached stems: identical
    accepted caches and (to fp tolerance) identical outputs/hints."""
    rng = np.random.default_rng(4)
    w, b = _wb(rng)
    base = rng.standard_normal((H, W, CIN)).astype(np.float32)
    frames = []
    for t in range(4):
        f = base.copy()
        f[4:9, 8 * t:8 * t + 6] += 1.0  # a moving blob
        frames.append(jnp.asarray(f))
    tau = 0.05
    cfg = _cfg()
    outs_p, st_p, stats_p, hint_p = _run_frames(
        _spec(), cfg, frames, w, b, tau)
    spec_d = dataclasses.replace(_spec(), backend="dense_cached")
    outs_d, st_d, stats_d, hint_d = _run_frames(
        spec_d, cfg, frames, w, b, tau)
    for yp, yd in zip(outs_p, outs_d):
        np.testing.assert_allclose(yp, yd, atol=1e-5, rtol=1e-5)
    # identical accepted input caches (per-pixel rule is backend-free)
    fg = flat4.flat4_geom(H, W, CIN)
    from cbinfer_tpu.ops.delta_conv import storage_interior
    from cbinfer_tpu.layers import _geometry
    g_d = _geometry(spec_d, (H, W, CIN), dataclasses.replace(
        cfg, backend="dense_cached"))
    np.testing.assert_array_equal(
        np.asarray(flat4.from_flat4(st_p.in_cache, fg)),
        np.asarray(storage_interior(st_d.in_cache, g_d)))
    # same dirty hint (both emit the exact HINT_TILE-grid change region)
    np.testing.assert_array_equal(np.asarray(hint_p.mask),
                                  np.asarray(hint_d.mask))
    assert int(stats_p["changed_pixels"]) == int(stats_d["changed_pixels"])


def test_cold_start_overflows_to_dense_then_goes_sparse():
    rng = np.random.default_rng(5)
    w, b = _wb(rng)
    cfg = _cfg(cap=0.25)  # capacity 1 tile of 4 -> frame 0 overflows
    spec = _spec()
    state = cb_layer_init(spec, (H, W, CIN), cfg)
    assert float(jnp.max(state.in_cache)) == float(
        np.float32(COLD_START_FILL))
    f0 = jnp.asarray(rng.standard_normal((H, W, CIN)), jnp.float32)
    y0, state, stats0, _ = cb_conv_apply((w, b), state, f0, spec, cfg,
                                         tau=0.05)
    assert bool(stats0["overflow"])
    assert int(stats0["computed_tiles"]) == int(stats0["n_tiles"])
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, 120)))
    bp = jnp.pad(b, (0, 120))
    y_ref = net.dense_conv(f0, wp, bp,
                           dataclasses.replace(spec, backend=None),
                           jnp.float32)
    np.testing.assert_allclose(np.asarray(y0.data), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)
    # frame 1: single-tile change -> sparse kernel path, no overflow
    f1 = f0.at[2:4, 2:4, :].add(1.0)
    y1, state, stats1, _ = cb_conv_apply((w, b), state, f1, spec, cfg,
                                         tau=0.05)
    assert not bool(stats1["overflow"])
    assert int(stats1["computed_tiles"]) < int(stats1["n_tiles"])
    y1_ref = net.dense_conv(f1, wp, bp,
                            dataclasses.replace(spec, backend=None),
                            jnp.float32)
    np.testing.assert_allclose(np.asarray(y1.data), np.asarray(y1_ref),
                               atol=1e-5, rtol=1e-5)


def test_refresh_matches_apply_pytree_and_values():
    rng = np.random.default_rng(6)
    w, b = _wb(rng)
    cfg = _cfg()
    spec = _spec()
    state = cb_layer_init(spec, (H, W, CIN), cfg)
    x = jnp.asarray(rng.standard_normal((H, W, CIN)), jnp.float32)
    ya, sta, stats_a, hint_a = cb_conv_apply((w, b), state, x, spec, cfg,
                                             tau=0.05)
    yr, str_, stats_r, hint_r = cb_conv_refresh((w, b), state, x, spec,
                                                cfg)
    # lax.cond contract: identical pytree structure and shapes/dtypes
    sa = jax.tree.map(lambda a: (a.shape, a.dtype) if hasattr(a, "shape")
                      else a, (ya, sta, stats_a, hint_a))
    sr = jax.tree.map(lambda a: (a.shape, a.dtype) if hasattr(a, "shape")
                      else a, (yr, str_, stats_r, hint_r))
    assert jax.tree.structure(sa) == jax.tree.structure(sr)
    assert jax.tree.leaves(sa) == jax.tree.leaves(sr)
    # cold start: apply overflows to the dense branch == refresh values
    np.testing.assert_allclose(np.asarray(ya.crop()),
                               np.asarray(yr.crop()), atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(sta.in_cache),
                                  np.asarray(str_.in_cache))


def test_flagship_policy_selects_patch_stem_only_when_supported():
    specs = [ConvSpec(features=COUT, kernel=(3, 3), stride=(1, 1),
                      dilation=(1, 1), padding="SAME", activation="relu")]
    pallas_cfg = PipelineConfig(backend="pallas")
    jnp_cfg = PipelineConfig(backend="jnp")
    ov, _ = flagship_layers(specs, (H, W, CIN), pallas_cfg)
    assert ov == {0: "patch_stem"}
    ov, _ = flagship_layers(specs, (H, W, CIN), jnp_cfg)
    assert ov == {0: "dense_cached"}
    # unsupported width -> dense_cached even on pallas
    ov, _ = flagship_layers(specs, (H, W + 8, CIN), pallas_cfg)
    assert ov == {0: "dense_cached"}
    # wide imported-feature stems keep the sparse delta path (ADVICE r2)
    ov, _ = flagship_layers(specs, (H, W, 256), pallas_cfg)
    assert ov == {}


@pytest.mark.parametrize("shape_tau", [(16, 64, 3, 0.05), (24, 96, 3, 0.0),
                                       (16, 32, 1, 0.1), (16, 64, 3, -1.0)])
def test_fused_detect_matches_xla_chain(shape_tau):
    """ops/pallas/flat4_detect.py == the XLA chain bit-for-bit: accepted
    cache bytes, RF-dilated 8x8 cell mask, and pixel count — across tau
    regimes including tau=-1 (all-changed refresh semantics, where the
    margin gating matters) and cin=1."""
    from cbinfer_tpu.ops.detect import changed_tile_mask
    from cbinfer_tpu.ops.geometry import conv_tile_geometry
    from cbinfer_tpu.ops.pallas.flat4_detect import detect_accept_flat4_pallas
    H, W, CIN, tau = shape_tau
    rng = np.random.default_rng(0)
    fg = flat4.flat4_geom(H, W, CIN)
    base = rng.standard_normal((H, W, CIN)).astype(np.float32)
    x = base.copy()
    for _ in range(4):
        i, j = rng.integers(0, H), rng.integers(0, W)
        x[i, j] += rng.standard_normal(CIN) * 0.5
    cache4 = flat4.to_flat4(jnp.asarray(base), fg, jnp.bfloat16)
    xj = jnp.asarray(x)
    new_ref, changed_ref, npix_ref = flat4.detect_accept_flat4(
        xj, cache4, tau, fg)
    g_hint = conv_tile_geometry((H, W, CIN), (3, 3), (1, 1), (1, 1),
                                "SAME", 8, 8)
    mask_ref = changed_tile_mask(changed_ref, g_hint)
    x4f = flat4.to_flat4(xj, fg, jnp.float32)
    new_k, mask_k, npix_k = detect_accept_flat4_pallas(
        x4f, cache4, tau, fg, interpret=True)
    np.testing.assert_array_equal(np.asarray(new_ref), np.asarray(new_k))
    np.testing.assert_array_equal(np.asarray(mask_ref).astype(bool),
                                  np.asarray(mask_k).astype(bool))
    assert int(npix_k[0]) == int(npix_ref)


def test_ingest_clip_resident_matches_classic_scan():
    """scan_video(ingest=True) — the clip-resident Flat4Clip form — must
    be BIT-identical to the classic per-frame path: same outputs, same
    final caches, same stats, in plain / refresh_start / refresh_every
    scans and in both stats forms (the detect kernel reads the same f32
    values out of the resident clip that to_flat4 feeds it per-frame)."""
    from cbinfer_tpu.convert import convert_flagship
    from cbinfer_tpu.network import init_params
    from cbinfer_tpu.runner import scan_video
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig

    Hs, Ws = 32, 64
    specs = (ConvSpec(features=8, kernel=(3, 3), activation="relu"),
             ConvSpec(features=8, kernel=(1, 1), activation=None))
    cfg = PipelineConfig(tile=TileConfig(8, 8), backend="pallas",
                         interpret=True)
    netc = convert_flagship(specs, (Hs, Ws, 3), cfg)
    assert netc.specs[0].backend == "patch_stem"
    params = init_params(specs, (Hs, Ws, 3), jax.random.PRNGKey(2))
    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=Hs, width=Ws, n_sprites=2, sprite_size=10,
        seed=9)).clip(5))
    taus = jnp.full((2,), 0.03, jnp.float32)
    for kw in ({}, {"refresh_start": True}, {"refresh_every": 2},
               {"refresh_start": True, "collect_stats": "mean"}):
        ys_a, st_a, stats_a = scan_video(netc, params, clip,
                                         thresholds=taus, **kw)
        wrapped = scan_video(netc, params, clip, thresholds=taus,
                             ingest=True, **kw)
        ys_b, st_b, stats_b = wrapped
        np.testing.assert_array_equal(np.asarray(ys_a), np.asarray(ys_b))
        for a, b in zip(jax.tree.leaves(st_a), jax.tree.leaves(st_b)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), stats_a, stats_b)
    # a net whose stem is NOT patch_stem silently falls back
    cfg_j = PipelineConfig(backend="jnp")
    from cbinfer_tpu.convert import convert
    netj = convert(specs, (Hs, Ws, 3), cfg_j)
    y1, _, _ = scan_video(netj, params, clip, thresholds=taus)
    y2, _, _ = scan_video(netj, params, clip, thresholds=taus, ingest=True)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_ingest_dus_gate_parity():
    """INGEST_DUS (carry-scratch flat4 ingest) must be bit-identical to
    the to_flat4 pad-chain form across frames, refresh, and overflow —
    it only changes WHERE the staging buffer's bytes come from."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from cbinfer_tpu import layers as L
    from cbinfer_tpu.config import PipelineConfig, TileConfig
    from cbinfer_tpu.convert import convert_flagship, num_cb_layers
    from cbinfer_tpu.models import get_model
    from cbinfer_tpu.network import init_params
    from cbinfer_tpu.runner import scan_video
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig

    H, W = 64, 96
    specs = get_model("scene", num_classes=4, width=16)
    cfg = PipelineConfig(tile=TileConfig(8, 8, capacity_fraction=0.375),
                         backend="pallas", interpret=True)
    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=2, sprite_size=10, seed=6)).clip(6))
    params = init_params(specs, (H, W, 3), jax.random.PRNGKey(0))

    outs = {}
    orig = L.INGEST_DUS
    try:
        for gate in (False, True):
            L.INGEST_DUS = gate
            net = convert_flagship(specs, (H, W, 3), cfg)
            tv = jnp.full((num_cb_layers(net.specs),), 0.03, jnp.float32)
            st = net.init_state()
            if gate:
                assert any(
                    getattr(s, "scratch", None) is not None
                    for s in st if s is not None), "scratch not allocated"
            ys, st, _ = scan_video(net, params, clip, state=st,
                                   thresholds=tv)
            outs[gate] = np.asarray(ys)
    finally:
        L.INGEST_DUS = orig
    np.testing.assert_array_equal(outs[False], outs[True])
