"""Fused delta-conv + NEXT-layer detect Pallas kernel (C4+C5+C6 ⊕ C1+C2).

The reference chains five kernels per layer (arXiv 1704.04313 §3); this
repo already fuses gather→GEMM→scatter into one kernel per layer
(ops/pallas/delta_conv.py) and detect→accept→dilate into another
(ops/pallas/detect.py::_sparse_kernel). The remaining cross-layer traffic
is structural: the CONSUMER layer's detect re-reads from HBM exactly the
tiles the PRODUCER's scatter just wrote (its y tile is still in VMEM at
scatter time), because a pixel outside the producer's recomputed tiles is
bit-identical to last frame (the producer-driven sparse-detection
argument, ops/pallas/detect.py doc).

This kernel runs the producer's delta-conv AND the consumer's detect in
one pass over the producer's changed-tile list: per tile it

  1. DMA-gathers the producer input window and runs the k²-shifted MXU
     conv (identical to _delta_conv_kernel),
  2. DMA-scatters y into the producer's aliased out cache,
  3. compares y (cast to cache dtype first — bit-parity with the unfused
     path, which reads the bf16 out cache back) against the consumer's
     accepted-value cache tile, writes the accepted tile back, counts
     changed pixels, and accumulates the consumer's dilated
     changed-output-tile mask via the indicator-matmul trick.

Bit-identical to ``delta_conv_pallas`` followed by ``detect_sparse`` under
the static FUSE GATE (``fuse_gate``): producer tiles are 8×8 == the hint
grid, the producer's logical output WIDTH is an 8-multiple, and both
channel widths are lane-aligned. A ragged output HEIGHT (e.g. the 180- and
90-row levels of the 720p zoo) is handled by visiting the padded grid at
unclamped origins and masking detect rows beyond ``out_h`` (fuse_gate
doc) — every conv→conv chain of the shipped 720p models satisfies the
gate.

Saves, per consumer-dirty tile and frame, one 8×8×C HBM read (the
consumer detect's x re-read), one kernel dispatch, and the separate
detect kernel's index decode — detect was ~24% of the pose frame and
~390 µs/frame at 720p (PROFILE.json stages, r3).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import TileGeometry
from .common import phase_slice

HINT = 8
NBUF = 4  # DMA pipeline depth (see ops/pallas/detect.NBUF rationale)


def fuse_gate(g: TileGeometry, g2: Optional[TileGeometry],
              lane_ok: bool = True) -> bool:
    """Static eligibility of the producer(g)→consumer(g2) detect fusion.

    Conditions (all static):
      * producer compute tiles are 8×8 — one compute tile == one hint tile
      * producer logical out WIDTH is an 8-multiple (every shipped map is;
        a clamped RIGHT edge would need misaligned W DMAs, which Mosaic
        rejects). The HEIGHT may be ragged: the kernel visits the padded
        tile grid at UNCLAMPED origins and masks detect rows beyond
        ``out_h`` — bit-identical to the unfused detect's clamped visit
        (the clamped window's extra top rows are either covered by their
        own tile's visit or unchanged; npix's own-rows rule counts the
        same set) — provided the consumer's storage has the bottom slack
        to hold the full last window (checked below; win_h_dma sizing
        provides it for every conv shape in the zoo)
      * consumer reads exactly the producer's output map
      * ``lane_ok``: both channel widths are 128-multiples (Mosaic DMA
        slot-slicing; interpret-mode tests may pass lane_ok=True with
        small C)
    """
    if g2 is None:
        return False
    return (g.th == HINT and g.tw == HINT
            and g.out_w % HINT == 0 and g.out_w_pad == g.out_w
            and g2.in_h == g.out_h and g2.in_w == g.out_w
            # bottom slack: the last unclamped window [out_h_pad-8,
            # out_h_pad) must fit inside the consumer's stored rows
            and g2.store_shape[0] >= g2.store_lo_h + g.out_h_pad
            and lane_ok)


def _kernel(idx_ref, m_ref,                     # scalar prefetch (SMEM)
            xp_ref, w_ref, b_ref, tau_ref,      # HBM, VMEM, VMEM, SMEM
            out_in_ref, ncache_in_ref,          # aliased HBM views
            out_ref, ncache_ref, mask_ref, npix_ref,   # outputs
            win_buf, y_buf, cbuf, abuf, in_sems, out_sems,  # scratch
            *, g: TileGeometry, g2: TileGeometry, cout: int,
            activation: Optional[str], compute_dtype):
    del out_in_ref, ncache_in_ref  # same memory as out_ref / ncache_ref
    kh, kw = g.kernel
    sh, sw = g.stride
    s2h, s2w = g2.stride
    m = m_ref[0]

    def tile_origin(i):
        t = idx_ref[i]
        ti = t // g.tiles_w
        tj = t - ti * g.tiles_w
        return ti * g.th, tj * g.tw   # UNCLAMPED padded-grid origins (the
        #                               consumer-detect rows beyond out_h
        #                               are masked; fuse_gate doc)

    def win_copy(slot, i):
        oy, ox = tile_origin(i)
        return pltpu.make_async_copy(
            xp_ref.at[pl.ds(oy * sh, g.win_h_dma),
                      pl.ds(ox * sw, g.win_w_dma), :],
            win_buf.at[slot], in_sems.at[slot, 0])

    def ccache_copy(slot, i):
        oy, ox = tile_origin(i)
        return pltpu.make_async_copy(
            ncache_ref.at[pl.ds(g2.store_lo_h + oy, HINT),
                          pl.ds(g2.store_lo_w + ox, HINT), :],
            cbuf.at[slot], in_sems.at[slot, 1])

    def y_copy(slot, i):
        oy, ox = tile_origin(i)
        return pltpu.make_async_copy(
            y_buf.at[slot],
            out_ref.at[pl.ds(oy, g.th), pl.ds(ox, g.tw), :],
            out_sems.at[slot, 0])

    def accept_copy(slot, i):
        oy, ox = tile_origin(i)
        return pltpu.make_async_copy(
            abuf.at[slot],
            ncache_ref.at[pl.ds(g2.store_lo_h + oy, HINT),
                          pl.ds(g2.store_lo_w + ox, HINT), :],
            out_sems.at[slot, 1])

    mask_ref[:] = jnp.zeros_like(mask_ref)
    npix_ref[0] = 0

    for k in range(NBUF - 1):  # prolog: fill the DMA pipeline
        @pl.when(k < m)
        def _(k=k):
            win_copy(k, k).start()
            ccache_copy(k, k).start()

    def body(i, _):
        slot = lax.rem(i, NBUF)

        @pl.when(i + NBUF - 1 < m)
        def _():
            nslot = lax.rem(i + NBUF - 1, NBUF)
            win_copy(nslot, i + NBUF - 1).start()
            ccache_copy(nslot, i + NBUF - 1).start()

        win_copy(slot, i).wait()

        # ---- producer conv: k² shifted MXU matmuls (delta_conv parity) ----
        win = win_buf[slot].astype(compute_dtype)
        acc = jnp.zeros((g.th * g.tw, cout), jnp.float32)
        for dy in range(kh):
            for dx in range(kw):
                patch = phase_slice(win, dy * g.dilation[0],
                                    g.dx0 + dx * g.dilation[1], g.th, g.tw,
                                    sh, sw).reshape(g.th * g.tw, g.cin)
                acc = acc + jnp.dot(patch, w_ref[dy, dx],
                                    preferred_element_type=jnp.float32)
        acc = acc + b_ref[0]
        if activation == "relu":
            acc = jnp.maximum(acc, 0.0)
        y_tile = acc.reshape(g.th, g.tw, cout).astype(y_buf.dtype)

        # drain the out-DMAs that used this slot NBUF iterations ago
        @pl.when(i >= NBUF)
        def _():
            y_copy(slot, i - NBUF).wait()
            accept_copy(slot, i - NBUF).wait()

        y_buf[slot] = y_tile
        y_copy(slot, i).start()

        # ---- consumer detect on the tile still in VMEM ----
        ccache_copy(slot, i).wait()
        c8 = cbuf[slot]
        # compare the CACHE-dtype y (the unfused path reads the bf16 out
        # cache back): f32 diff of the rounded values, exact parity
        diff = jnp.max(jnp.abs(y_tile.astype(jnp.float32)
                               - c8.astype(jnp.float32)), axis=-1)  # (8, 8)
        changed = diff > tau_ref[0]
        oy, ox = tile_origin(i)
        if g.out_h % HINT != 0:
            # ragged bottom edge: rows >= out_h are the producer's pad —
            # never detected, never accepted (the write-back below then
            # restores the read bytes: consumer-storage slack rows stay
            # bit-identical). Matches the unfused detect's own-rows rule.
            row_ids = (jax.lax.broadcasted_iota(jnp.int32, (HINT, HINT), 0)
                       + oy)
            changed = jnp.logical_and(changed, row_ids < g.out_h)
        npix_ref[0] += jnp.sum(changed.astype(jnp.int32))

        abuf[slot] = jnp.where(changed[..., None],
                               y_tile.astype(abuf.dtype), c8)
        accept_copy(slot, i).start()

        # ---- fused dilation for the CONSUMER's geometry (detect parity:
        # ops/pallas/detect._sparse_kernel indicator-matmul trick) ----
        a_start = (jax.lax.broadcasted_iota(jnp.int32, (g2.tiles_h, HINT), 0)
                   * (g2.th * s2h) - g2.pad_lo_h)
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (g2.tiles_h, HINT), 1) + oy
        m1 = ((a_start <= r_ids) & (r_ids < a_start + g2.win_h)
              ).astype(jnp.float32)
        b_start = (jax.lax.broadcasted_iota(jnp.int32, (HINT, g2.tiles_w), 1)
                   * (g2.tw * s2w) - g2.pad_lo_w)
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (HINT, g2.tiles_w), 0) + ox
        m2 = ((b_start <= c_ids) & (c_ids < b_start + g2.win_w)
              ).astype(jnp.float32)
        contrib = jnp.dot(jnp.dot(m1, changed.astype(jnp.float32),
                                  preferred_element_type=jnp.float32), m2,
                          preferred_element_type=jnp.float32)
        mask_ref[:] = jnp.maximum(mask_ref[:],
                                  (contrib > 0).astype(jnp.float32))

    lax.fori_loop(0, m, body, None)

    for k in range(NBUF):  # epilog: drain the last <=NBUF output copies
        @pl.when(m - NBUF + k >= 0)
        def _(k=k):
            j = m - NBUF + k
            slot = lax.rem(j, NBUF)
            y_copy(slot, j).wait()
            accept_copy(slot, j).wait()


def delta_conv_detect_pallas(
        xp: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray,
        b: Optional[jnp.ndarray], out_cache: jnp.ndarray,
        g: TileGeometry, activation: Optional[str], compute_dtype,
        next_cache: jnp.ndarray, next_tau, g2: TileGeometry, *,
        count: jnp.ndarray = None, interpret: bool = False):
    """Fused producer delta-conv + consumer detect (see module doc).

    Args mirror ``delta_conv_pallas`` plus the consumer's accepted-value
    cache (``next_cache``, donated/aliased), threshold and geometry.

    Returns (new_out_cache, new_next_cache,
             next_out_tile_mask f32 (g2.tiles_h, g2.tiles_w),
             changed_pixels int32 (1,)).
    """
    kh, kw = g.kernel
    cout = w.shape[-1]
    capacity = idx.shape[0]
    if count is None:
        count = jnp.asarray(capacity, jnp.int32)
    if b is None:
        b = jnp.zeros((cout,), w.dtype)
    assert fuse_gate(g, g2), (g, g2)
    assert g2.cin == cout == out_cache.shape[-1] == next_cache.shape[-1], \
        (g2.cin, cout, out_cache.shape, next_cache.shape)

    kern = functools.partial(_kernel, g=g, g2=g2, cout=cout,
                             activation=activation,
                             compute_dtype=compute_dtype)
    cache_dtype = out_cache.dtype
    flops_per_tile = 2 * g.th * g.tw * kh * kw * g.cin * cout

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # xp
            pl.BlockSpec(memory_space=pltpu.VMEM),             # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),             # bias
            pl.BlockSpec(memory_space=pltpu.SMEM),             # tau
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # out (aliased)
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # ncache (aliased)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # out cache
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # next cache
            pl.BlockSpec(memory_space=pltpu.VMEM),             # next mask
            pl.BlockSpec(memory_space=pltpu.SMEM),             # changed px
        ],
        scratch_shapes=[
            pltpu.VMEM((NBUF, g.win_h_dma, g.win_w_dma, g.cin), xp.dtype),
            pltpu.VMEM((NBUF, g.th, g.tw, cout), cache_dtype),
            pltpu.VMEM((NBUF, HINT, HINT, cout), next_cache.dtype),
            pltpu.VMEM((NBUF, HINT, HINT, cout), next_cache.dtype),
            pltpu.SemaphoreType.DMA((NBUF, 2)),
            pltpu.SemaphoreType.DMA((NBUF, 2)),
        ],
    )

    new_out, new_ncache, mask, npix = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(out_cache.shape, cache_dtype),
            jax.ShapeDtypeStruct(next_cache.shape, next_cache.dtype),
            jax.ShapeDtypeStruct((g2.tiles_h, g2.tiles_w), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        # flat operand index: 2 scalar-prefetch + (xp, w, b, tau, OUT, NC)
        input_output_aliases={6: 0, 7: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=int(flops_per_tile) * capacity,
            bytes_accessed=(capacity
                            * (g.win_h * g.win_w * g.cin
                               + 3 * g.th * g.tw * cout) * 4
                            + w.size * 4),
            transcendentals=0),
        interpret=interpret,
    )(idx, count.reshape(1), xp, w.astype(compute_dtype),
      b.reshape(1, cout).astype(jnp.float32),
      jnp.asarray([next_tau], jnp.float32), out_cache, next_cache)
    return new_out, new_ncache, mask, npix
