"""Fused change detection for SMALL-cin stems via channel-PLANAR layout.

STATUS — NEGATIVE RESULT, kept as documentation + test target: this Mosaic
kernel is correct (tests/test_stem_planar.py runs it under interpret=True)
but measured 1.6 ms/frame at 720p regardless of DMA chunking (vs ~0.1 ms
for the XLA form of the same math on the same planar layout,
detect.detect_and_update_planar) and cost a ~270 s Mosaic compile. The
planar LAYOUT is the fix; the hand kernel is not — XLA's fusion of the
elementwise planar ops beats the DMA loop here, exactly the "let XLA fuse,
don't hand-schedule" rule. The shipped dense_cached_planar backend uses
the XLA form.

The 3-channel stem is every workload's detect bottleneck: Mosaic physically
lane-pads rank-3 small-lane buffers ~43x and rejects DMA-slicing small-lane
HBM memrefs even for H-only slices (probed r2), so no HWC Pallas kernel can
serve a (H, W, 3) cache, and the shipped dense_cached stem pays 3-4 XLA
full-map passes on a pathological C=3 layout (~0.3 ms/frame at 720p,
PROFILE.json r2).

The TPU-native fix is a LAYOUT, not a bigger kernel: store the stem's
accepted-value cache channel-PLANAR — (C, H, W) — so the minor (lane) dim
is W (a 128-multiple at real resolutions) and every DMA slices only the
leading dims, which Mosaic allows at any C and 8-aligned H. One banded
kernel then fuses the whole detect stage (C1+C2): per 8-row band it reads
x and cache as (C, 8, W) blocks in ONE DMA each (the C planes are a
leading-dim slice), computes the per-pixel channel-max diff with pure
elementwise ops (planes are separate sublanes — no small-lane grouping
gymnastics), writes back the accepted values, and accumulates the exact
receptive-field-dilated changed-output-tile mask via the same indicator
matmuls as ops/pallas/detect._band_kernel.

The conv stage stays XLA (the dense_cached contract) but reads the planar
cache directly: network.dense_conv_planar builds its im2col patches by
slicing planes, so no per-frame HWC<->planar transpose of the cache ever
happens — only the incoming frame is transposed once (jnp.transpose,
fused by XLA into the producer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import TileGeometry

HINT = 8


def _planar_band_kernel(x_ref, cache_in_ref, tau_ref,
                        cache_ref, mask_ref, npix_ref,
                        xbuf, cbuf, wbuf, macc, in_sems, out_sems,
                        *, g: TileGeometry, C: int, H: int, W: int,
                        R: int, nchunks: int):
    del cache_in_ref  # aliased with cache_ref
    n = nchunks

    # Buffers are (C, R, W) per slot; HBM is the FLATTENED (C*H, W)
    # planar array, so every DMA is a plain 2D row-chunk slice at offset
    # c*H + t*R (8-aligned: R % 8 == 0) — the same pattern as
    # detect._band_kernel. Two probed cliffs shape this (r3):
    #   * a single rank-3 copy with a middle-dim slice ([:, oy:oy+8, :])
    #     HANGS on this hardware (dispatch returns, the fetch never
    #     completes; interpret mode does not model DMA and cannot catch
    #     it) — hence one 2D copy per plane;
    #   * 8-row chunks are DMA-ISSUE-bound (9 copies/band x 90 bands =
    #     810 DMAs ~= 1.6 ms/frame at 720p) — hence R up to 128 rows per
    #     chunk (~54 DMAs/frame, bandwidth-bound).
    def copy_in(slot, t, which):
        oy = t * R
        src = x_ref if which == 0 else cache_ref
        buf = xbuf if which == 0 else cbuf
        return [pltpu.make_async_copy(
            src.at[pl.ds(c * H + oy, R), :], buf.at[slot, c],
            in_sems.at[slot, which, c]) for c in range(C)]

    def copy_out(slot, t):
        oy = t * R
        return [pltpu.make_async_copy(
            wbuf.at[slot, c], cache_ref.at[pl.ds(c * H + oy, R), :],
            out_sems.at[slot, c]) for c in range(C)]

    macc[:] = jnp.zeros_like(macc)
    npix_ref[0] = 0
    for cp in copy_in(0, 0, 0) + copy_in(0, 0, 1):
        cp.start()

    def body(t, _):
        slot = lax.rem(t, 2)

        @pl.when(t + 1 < n)
        def _():
            for cp in copy_in(1 - slot, t + 1, 0) \
                    + copy_in(1 - slot, t + 1, 1):
                cp.start()

        for cp in copy_in(slot, t, 0) + copy_in(slot, t, 1):
            cp.wait()

        xb = xbuf[slot]                             # (C, R, W)
        cb = cbuf[slot]
        diff = jnp.max(jnp.abs(xb.astype(jnp.float32)
                               - cb.astype(jnp.float32)), axis=0)  # (8, W)
        changed = diff > tau_ref[0]
        npix_ref[0] += jnp.sum(changed.astype(jnp.int32))

        @pl.when(t >= 2)
        def _():
            for cp in copy_out(slot, t - 2):
                cp.wait()

        wbuf[slot] = jnp.where(changed[None], xb, cb)
        for cp in copy_out(slot, t):
            cp.start()

        # exact receptive-field dilation onto the stem's OUTPUT tile grid
        # (indicator matmuls — ops/pallas/detect._band_kernel)
        oy = t * R
        a_start = (jax.lax.broadcasted_iota(jnp.int32, (g.tiles_h, R), 0)
                   * (g.th * g.stride[0]) - g.pad_lo_h)
        r_ids = (jax.lax.broadcasted_iota(jnp.int32, (g.tiles_h, R), 1)
                 + oy)
        m1 = ((a_start <= r_ids) & (r_ids < a_start + g.win_h)
              ).astype(jnp.float32)
        b_start = (jax.lax.broadcasted_iota(jnp.int32, (W, g.tiles_w), 1)
                   * (g.tw * g.stride[1]) - g.pad_lo_w)
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (W, g.tiles_w), 0)
        m2 = ((b_start <= c_ids) & (c_ids < b_start + g.win_w)
              ).astype(jnp.float32)
        # associate as m1 @ (changed @ m2): the (8, W) x (W, tiles_w)
        # contraction first — the other order materializes a (tiles_h, W)
        # intermediate whose matmul costs ~10x more (measured 2.3 ms vs
        # 0.26 ms per 720p frame, r3); exact either way (0/1 counts, f32)
        contrib = jnp.dot(m1, jnp.dot(changed.astype(jnp.float32), m2,
                                      preferred_element_type=jnp.float32),
                          preferred_element_type=jnp.float32)
        macc[:] = jnp.maximum(macc[:], (contrib > 0).astype(jnp.float32))

    lax.fori_loop(0, n, body, None)

    @pl.when(n >= 2)
    def _():
        for cp in copy_out(lax.rem(n, 2), n - 2):
            cp.wait()

    for cp in copy_out(lax.rem(n - 1, 2), n - 1):
        cp.wait()
    mask_ref[:] = macc[:]


def detect_planar_pallas(x_planar: jnp.ndarray, in_cache: jnp.ndarray, tau,
                         g: TileGeometry, *, interpret: bool = False):
    """Fused full-map detect+update+dilate on PLANAR buffers.

    Args:
      x_planar: (C*H, W) current frame, channel-planar FLATTENED (plane c
        occupies rows [c*H, (c+1)*H) — the DMA-legal layout, kernel doc).
      in_cache: (C*H, W) accepted-value cache, aliased/donated (UNPADDED
        spatially — the dense_cached conv pads on read, there is no margin
        storage in planar mode).
      g: the stem conv's tile geometry (built on the logical H, W).

    Returns (new_cache (C*H, W), out_tile_mask f32 (tiles_h, tiles_w),
    changed_pixels int32 (1,)).
    """
    CH, W = x_planar.shape
    H = g.in_h
    C = CH // H
    assert C * H == CH and H % HINT == 0 and W % 8 == 0, (CH, H, W)
    # rows per chunk: largest 8-multiple divisor of H up to 128 (DMA-issue
    # amortization; kernel doc)
    R = max(r for r in range(8, min(H, 64) + 1, 8) if H % r == 0)
    nchunks = H // R
    kern = functools.partial(_planar_band_kernel, g=g, C=C, H=H, W=W,
                             R=R, nchunks=nchunks)
    new_cache, mask, npix = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(in_cache.shape, in_cache.dtype),
            jax.ShapeDtypeStruct((g.tiles_h, g.tiles_w), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, C, R, W), in_cache.dtype),
            pltpu.VMEM((2, C, R, W), in_cache.dtype),
            pltpu.VMEM((2, C, R, W), in_cache.dtype),
            pltpu.VMEM((g.tiles_h, g.tiles_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2, C)),
            pltpu.SemaphoreType.DMA((2, C)),
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(x_planar.astype(in_cache.dtype), in_cache,
      jnp.asarray([tau], jnp.float32))
    return new_cache, mask, npix
