"""band_cached stem backend (layers.cb_conv_apply band branch).

The full-width row-band sparse stem must be VALUE-IDENTICAL to the
dense_cached stem (same detect, same accepted cache, superset recompute
from that cache), emit the same fine 8x8 hint chain, and actually skip
work on sparse frames. Identity is EXACT in f32 (asserted below). In
bf16 the two conv epilogues differ by final-rounding ulps — _accumulate
does an fp32 dot + fp32 bias/relu with one final cast, dense_conv's
small-cin im2col rounds at the bf16 dot output and adds bias in bf16 —
which is sub-tau drift of the same class the refresh path documents;
eval_headline re-measures ground-truth accuracy with any stem policy
applied, so the deployed flip is never accepted on the identity claim
alone. The overflow fallback (dense_conv_shifted) shares conv_tiles'
accumulation epilogue, so overflow frames stay on the same lax.cond
bit-alignment contract as the jnp tile path (ops/delta_conv.py doc).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbinfer_tpu.config import PipelineConfig, TileConfig
from cbinfer_tpu.convert import convert, num_cb_layers
from cbinfer_tpu.models import get_model
from cbinfer_tpu.network import init_params
from cbinfer_tpu.runner import scan_video
from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig

H, W, T = 96, 128, 6


@pytest.fixture(scope="module")
def setup():
    specs = get_model("scene", num_classes=8, width=32)
    params = init_params(specs, (H, W, 3), jax.random.PRNGKey(1))
    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=3, sprite_size=16, seed=3)).clip(T))
    return specs, params, clip


def _run(specs, params, clip, stem, backend="jnp", taus=0.02,
         refresh=False, interpret=False, capacity=0.75):
    # capacity 0.75: the seed-3 sprites span 7 of 12 row bands, so the
    # band stem needs >= 7 band slots or every frame overflows to the
    # dense fallback and the "skips work" assertions can't hold
    cfg = PipelineConfig(
        tile=TileConfig(8, 8, capacity_fraction=capacity), backend=backend,
        compute_dtype="float32", cache_dtype="float32", interpret=interpret)
    n_cb = num_cb_layers(specs)
    net = convert(specs, (H, W, 3), cfg, thresholds=[taus] * n_cb,
                  backend_overrides={0: stem})
    st = net.init_state()
    fn = jax.jit(lambda p, f, s: scan_video(net, p, f, state=s,
                                            refresh_start=refresh))
    ys, st, stats = fn(params, clip, st)
    if refresh:  # second chunk exercises refresh-on-warm-state too
        ys, st, stats = fn(params, clip, st)
    dense = jax.jit(lambda p, f: jax.lax.map(
        lambda x: net.apply_dense(p, x), f))(params, clip)
    return np.asarray(ys), stats, np.asarray(dense)


def test_band_stem_bit_identical_to_dense_cached(setup):
    specs, params, clip = setup
    y_ref, _, _ = _run(specs, params, clip, "dense_cached")
    y_band, stats, _ = _run(specs, params, clip, "band_cached")
    np.testing.assert_array_equal(y_ref, y_band)
    # sparse frames must compute fewer fine-grid tile units than the grid
    computed = np.asarray(stats[0]["computed_tiles"])
    n_tiles = int(np.asarray(stats[0]["n_tiles"]).reshape(-1)[0])
    assert computed.min() < n_tiles, (computed, n_tiles)


def test_band_stem_overflow_fallback_matches(setup):
    # capacity so small every moving frame overflows -> dense fallback path
    specs, params, clip = setup
    y_ref, _, _ = _run(specs, params, clip, "dense_cached", capacity=0.05)
    y_band, stats, _ = _run(specs, params, clip, "band_cached",
                            capacity=0.05)
    assert int(np.asarray(stats[0]["overflow"]).sum()) > 0
    np.testing.assert_array_equal(y_ref, y_band)


def test_band_stem_refresh_prolog(setup):
    specs, params, clip = setup
    y_ref, _, _ = _run(specs, params, clip, "dense_cached", refresh=True)
    y_band, _, _ = _run(specs, params, clip, "band_cached", refresh=True)
    np.testing.assert_array_equal(y_ref, y_band)


def test_band_stem_tau0_matches_dense(setup):
    specs, params, clip = setup
    y_band, _, dense = _run(specs, params, clip, "band_cached", taus=0.0)
    np.testing.assert_allclose(y_band, dense, atol=1e-4, rtol=1e-4)


def test_band_stem_under_pallas_pipeline_interpret(setup):
    # the hint chain the band stem emits must drive the Pallas consumers
    specs, params, clip = setup
    y_band, _, dense = _run(specs, params, clip, "band_cached", taus=0.0,
                            backend="pallas", interpret=True)
    np.testing.assert_allclose(y_band, dense, atol=1e-4, rtol=1e-4)


def test_band_stem_refresh_stats_in_fine_units(setup):
    """refresh_every runs apply_refresh in a lax.cond against apply —
    stats pytrees must match AND the refresh frame must report the FINE
    grid (a band = a full row of fine tiles), not band units, or
    effective_flops underprices refresh frames."""
    specs, params, clip = setup
    cfg = PipelineConfig(tile=TileConfig(8, 8, capacity_fraction=0.75),
                         backend="jnp", compute_dtype="float32",
                         cache_dtype="float32")  # 0.75: see _run
    net = convert(specs, (H, W, 3), cfg,
                  thresholds=[0.02] * num_cb_layers(specs),
                  backend_overrides={0: "band_cached"})
    ys, st, stats = jax.jit(lambda f: scan_video(
        net, init_params(specs, (H, W, 3), jax.random.PRNGKey(1)), f,
        refresh_every=3))(clip)
    computed = np.asarray(stats[0]["computed_tiles"])
    n_tiles = int(np.asarray(stats[0]["n_tiles"]).reshape(-1)[0])
    assert n_tiles == (H // 8) * (W // 8)          # fine grid, not bands
    assert computed[0] == n_tiles and computed[3] == n_tiles  # refresh
    assert computed[1] < n_tiles                   # sparse frame skips
