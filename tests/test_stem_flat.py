"""Flat stem (dense_cached_flat): detect on the flat (H, W*C) cache view
+ lane-padded stem output == the XLA dense_cached stem, bit-for-bit
pipeline parity (detect.detect_and_update_flat)."""

import numpy as np
import jax
import jax.numpy as jnp

from cbinfer_tpu.config import ConvSpec, PipelineConfig, PoolSpec, TileConfig
from cbinfer_tpu.convert import convert, convert_flagship, flagship_layers
from cbinfer_tpu.network import init_params
from cbinfer_tpu.runner import scan_video
from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig


def _specs():
    return [
        ConvSpec(features=16, threshold=0.03),
        PoolSpec(threshold=0.03),
        ConvSpec(features=16, threshold=0.03),
        ConvSpec(features=5, kernel=(1, 1), activation=None, threshold=0.03),
    ]


def _nets(h=32, w=48):
    base = PipelineConfig(tile=TileConfig(tile_h=8, tile_w=8),
                          backend="jnp", interpret=True)
    specs = _specs()
    planar = convert(specs, (h, w, 3), base,
                     backend_overrides={0: "dense_cached_flat"})
    ref = convert(specs, (h, w, 3), base,
                  backend_overrides={0: "dense_cached"})
    params = init_params(specs, (h, w, 3), jax.random.PRNGKey(11))
    return planar, ref, params


def test_planar_stem_matches_dense_cached_pipeline():
    planar, ref, params = _nets()
    video = SpriteVideo(SpriteVideoConfig(height=32, width=48, n_sprites=2,
                                          sprite_size=7, speed=3.0,
                                          noise_std=0.01, seed=31))
    clip = jnp.asarray(video.clip(5))
    ys_p, st_p, stats_p = scan_video(planar, params, clip)
    ys_r, st_r, stats_r = scan_video(ref, params, clip)
    # identical per-pixel detect semantics; outputs agree to fp tolerance
    # (the flat stem's lane-PADDED weight matmul tiles differently in XLA
    # than the unpadded one -> last-ulp accumulation differences)
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_r),
                               atol=2e-3, rtol=2e-3)
    for key in ("changed_tiles", "changed_pixels", "computed_tiles"):
        # layer-0 detection runs BEFORE the conv: counters are bit-equal
        np.testing.assert_array_equal(
            np.asarray(stats_p[0][key]), np.asarray(stats_r[0][key]), key)
    # the flat cache is the HWC cache interior, same memory layout
    from cbinfer_tpu.ops.delta_conv import storage_interior
    from cbinfer_tpu.layers import _geometry
    g = _geometry(ref.specs[0], (32, 48, 3), ref.cfg)
    hwc = np.asarray(storage_interior(st_r[0].in_cache, g))
    np.testing.assert_array_equal(
        np.asarray(st_p[0].in_cache), hwc.reshape(32, 48 * 3))


def test_planar_stem_refresh_matches_apply_structure():
    planar, ref, params = _nets()
    video = SpriteVideo(SpriteVideoConfig(height=32, width=48, n_sprites=2,
                                          sprite_size=7, seed=32))
    clip = jnp.asarray(video.clip(4))
    # refresh_every exercises the lax.cond whose branches must agree in
    # pytree structure between apply and refresh on the planar stem
    ys_p, _, _ = scan_video(planar, params, clip, refresh_every=2)
    ys_r, _, _ = scan_video(ref, params, clip, refresh_every=2)
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_r),
                               atol=2e-3, rtol=2e-3)


def test_flagship_selects_dense_cached_stem():
    # the flat/planar stem variants measured SLOWER in-scan (r3 probes,
    # convert.flagship_layers doc) — flagship ships dense_cached on every
    # backend; dense_cached_flat stays available as an explicit override
    specs = _specs()
    cfg_p = PipelineConfig(tile=TileConfig(8, 8), backend="pallas",
                           interpret=True)
    cfg_j = PipelineConfig(tile=TileConfig(8, 8), backend="jnp")
    ov_p, _ = flagship_layers(specs, (32, 48, 3), cfg_p)
    ov_j, _ = flagship_layers(specs, (32, 48, 3), cfg_j)
    assert ov_p == {0: "dense_cached"}
    assert ov_j == {0: "dense_cached"}
    # full flagship pipeline on the pallas-interpret path still matches the
    # jnp flagship twin
    net_p = convert_flagship(specs, (32, 48, 3), cfg_p)
    net_j = convert_flagship(specs, (32, 48, 3), cfg_j)
    assert net_p.specs[0].backend == "dense_cached"
    params = init_params(specs, (32, 48, 3), jax.random.PRNGKey(12))
    video = SpriteVideo(SpriteVideoConfig(height=32, width=48, n_sprites=2,
                                          sprite_size=7, seed=33))
    clip = jnp.asarray(video.clip(4))
    ys_p, _, _ = scan_video(net_p, params, clip)
    ys_j, _, _ = scan_video(net_j, params, clip)
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_j),
                               atol=1e-5)
