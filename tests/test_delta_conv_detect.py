"""Fused delta-conv + next-layer detect kernel vs the unfused pair.

The fused kernel (ops/pallas/delta_conv_detect.py) must be BIT-identical
to ``delta_conv_pallas`` followed by ``detect_sparse`` under the fuse
gate: same out cache, same consumer accepted cache, same dilated consumer
mask, same changed-pixel count — across consumer kernel/stride shapes,
cache dtypes, and tau regimes (incl. tau=-1 all-changed and a tau high
enough that nothing changes).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from cbinfer_tpu.ops.geometry import conv_tile_geometry
from cbinfer_tpu.ops.compact import compact_mask
from cbinfer_tpu.ops.pallas.delta_conv import delta_conv_pallas
from cbinfer_tpu.ops.pallas.delta_conv_detect import (delta_conv_detect_pallas,
                                                      fuse_gate)
from cbinfer_tpu.ops.pallas.detect import detect_sparse


def _setup(k2, s2, cache_dtype, cin=8, cout=16, H=32, W=48, seed=0):
    rng = np.random.default_rng(seed)
    g = conv_tile_geometry((H, W, cin), (3, 3), (1, 1), (1, 1), "SAME", 8, 8)
    assert g.out_w % 8 == 0  # ragged out_h allowed (fuse_gate doc)
    g2 = conv_tile_geometry((g.out_h, g.out_w, cout), (k2, k2), s2, (1, 1),
                            "SAME", 8, 8)
    assert fuse_gate(g, g2)
    xp = jnp.asarray(rng.standard_normal(g.store_shape), cache_dtype)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.float32)
    out0 = jnp.asarray(rng.standard_normal(
        (g.out_h_pad, g.out_w_pad, cout)), cache_dtype)
    # consumer accepted cache: out0-ish so some pixels cross tau, some don't
    nc0 = rng.standard_normal(g2.store_shape) * 0.05
    ylo, xlo = g2.store_lo_h, g2.store_lo_w
    nc0[ylo:ylo + g.out_h, xlo:xlo + g.out_w] += np.asarray(
        out0, np.float32)[:g.out_h, :g.out_w]
    nc0 = jnp.asarray(nc0, cache_dtype)
    mask = np.zeros((g.tiles_h, g.tiles_w), bool)
    mask.flat[[0, 3, g.n_tiles - 1, g.n_tiles // 2, 7]] = True
    comp = compact_mask(jnp.asarray(mask), g.n_tiles)
    return g, g2, xp, w, b, out0, nc0, comp


@pytest.mark.parametrize("k2,s2", [(3, (1, 1)), (1, (1, 1)), (3, (2, 2)),
                                   (7, (1, 1))])
@pytest.mark.parametrize("cache_dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("tau2", [0.05, -1.0, 1e9])
def test_fused_matches_unfused_pair(k2, s2, cache_dtype, tau2):
    g, g2, xp, w, b, out0, nc0, comp = _setup(k2, s2, cache_dtype)

    out_ref = delta_conv_pallas(xp, comp.idx, w, b, out0, g, "relu",
                                count=comp.count, interpret=True)
    x2 = out_ref[:g.out_h, :g.out_w]
    nc_ref, mask_ref, npix_ref = detect_sparse(
        x2, nc0, tau2, comp.idx, comp.count, g2, interpret=True)

    out_f, nc_f, mask_f, npix_f = delta_conv_detect_pallas(
        xp, comp.idx, w, b, out0, g, "relu", jnp.float32,
        nc0, tau2, g2, count=comp.count, interpret=True)

    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_ref))
    np.testing.assert_array_equal(np.asarray(nc_f), np.asarray(nc_ref))
    np.testing.assert_array_equal(np.asarray(mask_f), np.asarray(mask_ref))
    np.testing.assert_array_equal(np.asarray(npix_f), np.asarray(npix_ref))


def test_fused_count_zero_is_noop():
    g, g2, xp, w, b, out0, nc0, _ = _setup(3, (1, 1), jnp.float32)
    idx = jnp.full((4,), g.n_tiles, jnp.int32)
    out_f, nc_f, mask_f, npix_f = delta_conv_detect_pallas(
        xp, idx, w, b, out0, g, "relu", jnp.float32,
        nc0, 0.05, g2, count=jnp.asarray(0, jnp.int32), interpret=True)
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out0))
    np.testing.assert_array_equal(np.asarray(nc_f), np.asarray(nc0))
    assert not np.asarray(mask_f).any()
    assert int(npix_f[0]) == 0


def test_fuse_gate_rejects_misaligned():
    # 30-row output (ragged height) IS accepted — masked-row handling
    g = conv_tile_geometry((30, 48, 8), (3, 3), (1, 1), (1, 1), "SAME", 8, 8)
    g2 = conv_tile_geometry((g.out_h, g.out_w, 16), (3, 3), (1, 1), (1, 1),
                            "SAME", 8, 8)
    assert fuse_gate(g, g2)
    # ragged WIDTH is rejected (misaligned W DMAs)
    gw = conv_tile_geometry((32, 44, 8), (3, 3), (1, 1), (1, 1), "SAME", 8, 8)
    gw2 = conv_tile_geometry((gw.out_h, gw.out_w, 16), (3, 3), (1, 1), (1, 1),
                             "SAME", 8, 8)
    assert not fuse_gate(gw, gw2)
    # consumer on a different map
    ga = conv_tile_geometry((32, 48, 8), (3, 3), (1, 1), (1, 1), "SAME", 8, 8)
    gb = conv_tile_geometry((16, 24, 16), (3, 3), (1, 1), (1, 1),
                            "SAME", 8, 8)
    assert not fuse_gate(ga, gb)
    assert not fuse_gate(ga, None)


@pytest.mark.parametrize("H", [30, 90])
@pytest.mark.parametrize("k2,s2", [(3, (1, 1)), (3, (2, 2)), (1, (1, 1))])
def test_fused_ragged_height_matches_unfused_pair(H, k2, s2):
    """Ragged out_h (not an 8-multiple): the fused kernel visits padded
    origins with masked rows — bit parity with the clamped unfused pair,
    including the changed-pixel count (own-rows rule).

    The consumer cache here honors the streaming invariant |x − cache| ≤
    tau OUTSIDE the producer's dirty tiles (rejected pixels keep sub-tau
    diffs; cold start/refresh accept everything): the unfused clamped
    bottom visit over-reads rows of the tile ABOVE it, and only under
    this invariant (which every constant-tau stream satisfies) are those
    rows guaranteed quiet. An arbitrary cache there diverges by ≤ tau —
    outside the fused path's contract."""
    tau2 = 0.05
    g, g2, xp, w, b, out0, nc0, comp = _setup(k2, s2, jnp.float32, H=H)
    assert g.out_h % 8 != 0 and fuse_gate(g, g2)
    # rebuild nc0 under the invariant: sub-tau noise everywhere, supra-tau
    # deltas only inside the producer's dirty tiles
    rng = np.random.default_rng(1)
    base = np.zeros(g2.store_shape, np.float32)
    ylo, xlo = g2.store_lo_h, g2.store_lo_w
    base[ylo:ylo + g.out_h, xlo:xlo + g.out_w] = np.asarray(
        out0, np.float32)[:g.out_h, :g.out_w]
    noise = rng.uniform(-tau2 * 0.4, tau2 * 0.4, base.shape).astype(
        np.float32)
    big = rng.uniform(2 * tau2, 4 * tau2, base.shape).astype(np.float32) \
        * rng.choice([0.0, 1.0, -1.0], base.shape).astype(np.float32)
    dirty_pix = np.zeros(g2.store_shape[:2], bool)
    for t in np.asarray(comp.idx[:int(comp.count)]):
        ti, tj = divmod(int(t), g.tiles_w)
        # UNCLAMPED origins: supra-tau deltas only where BOTH paths visit
        # (the clamped unfused window's extra top rows must stay sub-tau —
        # they belong to the tile above)
        oy = ti * 8 + ylo
        ox = tj * 8 + xlo
        dirty_pix[oy:oy + 8, ox:ox + 8] = True
    nc0 = jnp.asarray(base + noise + np.where(dirty_pix[..., None], big, 0))

    out_ref = delta_conv_pallas(xp, comp.idx, w, b, out0, g, "relu",
                                count=comp.count, interpret=True)
    x2 = out_ref[:g.out_h, :g.out_w]
    nc_ref, mask_ref, npix_ref = detect_sparse(
        x2, nc0, 0.05, comp.idx, comp.count, g2, interpret=True)

    out_f, nc_f, mask_f, npix_f = delta_conv_detect_pallas(
        xp, comp.idx, w, b, out0, g, "relu", jnp.float32,
        nc0, 0.05, g2, count=comp.count, interpret=True)

    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_ref))
    np.testing.assert_array_equal(np.asarray(nc_f), np.asarray(nc_ref))
    np.testing.assert_array_equal(np.asarray(mask_f), np.asarray(mask_ref))
    np.testing.assert_array_equal(np.asarray(npix_f), np.asarray(npix_ref))
