"""Change-based max-pool Pallas TPU kernel (C7).

Same fused gather->compute->scatter structure as delta_conv.py, with a
windowed max on the VPU instead of MXU matmuls (reference: dedicated CUDA
pooling kernel, arXiv 1808.05488 §IV-F).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import TileGeometry
from .common import phase_slice


NBUF = 4  # DMA pipeline depth (see ops/pallas/detect.NBUF)


def _delta_pool_kernel(idx_ref, m_ref, xp_ref, out_in_ref, out_ref,
            win_buf, y_buf, in_sems, out_sems, *, g: TileGeometry):
    del out_in_ref  # aliased with out_ref
    kh, kw = g.kernel
    sh, sw = g.stride
    m = m_ref[0]

    def in_copy(slot, i):
        t = idx_ref[i]
        ti = t // g.tiles_w
        tj = t - ti * g.tiles_w
        return pltpu.make_async_copy(
            xp_ref.at[pl.ds(ti * g.th * sh, g.win_h_dma),
                      pl.ds(tj * g.tw * sw, g.win_w_dma), :],
            win_buf.at[slot],
            in_sems.at[slot])

    def out_copy(slot, i):
        t = idx_ref[i]
        ti = t // g.tiles_w
        tj = t - ti * g.tiles_w
        return pltpu.make_async_copy(
            y_buf.at[slot],
            out_ref.at[pl.ds(ti * g.th, g.th), pl.ds(tj * g.tw, g.tw), :],
            out_sems.at[slot])

    for k in range(NBUF - 1):  # prolog: fill the DMA pipeline
        @pl.when(k < m)
        def _(k=k):
            in_copy(k, k).start()

    def body(i, _):
        slot = lax.rem(i, NBUF)

        @pl.when(i + NBUF - 1 < m)
        def _():
            in_copy(lax.rem(i + NBUF - 1, NBUF), i + NBUF - 1).start()

        in_copy(slot, i).wait()

        win = win_buf[slot]
        y = None
        for dy in range(kh):
            for dx in range(kw):
                patch = phase_slice(win, dy, g.dx0 + dx, g.th, g.tw, sh, sw)
                y = patch if y is None else jnp.maximum(y, patch)

        @pl.when(i >= NBUF)
        def _():
            out_copy(slot, i - NBUF).wait()

        # explicit cast (conv-twin discipline): xp and out_cache dtypes
        # are independent in the signature, and a dtype-mismatched ref
        # store is a trace-time Pallas error
        y_buf[slot] = y.astype(y_buf.dtype)

        out_copy(slot, i).start()

    lax.fori_loop(0, m, body, None)

    for k in range(NBUF):  # drain the last <=NBUF output DMAs
        @pl.when(m - NBUF + k >= 0)
        def _(k=k):
            j = m - NBUF + k
            out_copy(lax.rem(j, NBUF), j).wait()


def _fused_pool_kernel(idx_ref, m_ref,         # scalar prefetch
                  x_ref, out_in_ref,           # tensors (HBM, HBM aliased)
                  out_ref, mask_ref,           # outputs (HBM alias, VMEM)
                  xbuf, ybuf, in_sems, out_sems,  # scratch
                  *, hint_h: int, hint_w: int,
                  blocks_w: int, tiles_h: int, tiles_w: int, pool: int):
    """Hint-forwarded pool (CB17 mask-forwarding at the pool layer): per
    producer-dirty input BLOCK (hint_h x hint_w — two adjacent 8x8 hint
    tiles paired in W so the pooled output slice stays 8-sublane-aligned,
    Mosaic's HBM slicing rule), pool it and scatter the pooled block — no
    per-pixel detection, no input cache, ONE loop instead of
    detect+compact+pool. Valid only for aligned pools (k == s == pool,
    hint_h % pool == 0, (hint_w/pool) % 8 == 0), where a block maps to
    exactly one output region inside one out tile (windows never cross
    block edges).

    Exact by construction: the producer's hint is a conservative superset
    of its changed pixels, and every recomputed pooled block is computed
    from the producer's CURRENT accepted values.
    """
    del out_in_ref  # aliased with out_ref
    m = m_ref[0]
    out_h = hint_h // pool
    out_w = hint_w // pool

    def block_ij(i):
        t = idx_ref[i]
        hi = t // blocks_w
        return hi, t - hi * blocks_w

    def in_copy(slot, i):
        hi, hj = block_ij(i)
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(hi * hint_h, hint_h),
                     pl.ds(hj * hint_w, hint_w), :],
            xbuf.at[slot], in_sems.at[slot])

    def out_copy(slot, i):
        hi, hj = block_ij(i)
        # offsets as direct multiples of the (8-aligned) block extents so
        # Mosaic can PROVE sublane divisibility (hj*out_w, not ox//pool)
        return pltpu.make_async_copy(
            ybuf.at[slot],
            out_ref.at[pl.ds(hi * out_h, out_h),
                       pl.ds(hj * out_w, out_w), :],
            out_sems.at[slot])

    mask_ref[:] = jnp.zeros_like(mask_ref)

    for k in range(NBUF - 1):
        @pl.when(k < m)
        def _(k=k):
            in_copy(k, k).start()

    def body(i, _):
        slot = lax.rem(i, NBUF)

        @pl.when(i + NBUF - 1 < m)
        def _():
            in_copy(lax.rem(i + NBUF - 1, NBUF), i + NBUF - 1).start()

        in_copy(slot, i).wait()
        # aligned pool: windows never cross the block, so the max reduces
        # over reshape-split axes (leading-dim and sublane splits only —
        # no strided slices, no phase extraction slack needed)
        win = xbuf[slot]                                  # (hint_h, hint_w, C)
        C = win.shape[-1]
        r = jnp.max(win.reshape(out_h, pool, hint_w, C), axis=1)
        y = jnp.max(r.reshape(out_h, out_w, pool, C), axis=2)

        @pl.when(i >= NBUF)
        def _():
            out_copy(slot, i - NBUF).wait()

        ybuf[slot] = y.astype(ybuf.dtype)  # x/out dtypes are independent
        out_copy(slot, i).start()

        # mark the touched out tile of THIS layer's (tiles_h, tiles_w)
        # grid: one cell per block (aligned pools; block pooled extents
        # divide the 8x8 out tile) — an outer product of one-hot row/col
        # indicators (pure vector ops)
        hi, hj = block_ij(i)
        ti = (hi * out_h) // 8  # out-tile grid is 8x8 on the pooled map
        tj = (hj * out_w) // 8
        row = (jax.lax.broadcasted_iota(jnp.int32, (tiles_h, 1), 0)
               == ti).astype(jnp.float32)
        col = (jax.lax.broadcasted_iota(jnp.int32, (1, tiles_w), 1)
               == tj).astype(jnp.float32)
        mask_ref[:] = jnp.maximum(mask_ref[:], row * col)

    lax.fori_loop(0, m, body, None)

    for k in range(NBUF):
        @pl.when(m - NBUF + k >= 0)
        def _(k=k):
            j = m - NBUF + k
            out_copy(lax.rem(j, NBUF), j).wait()


def detect_pool_fused(x: jnp.ndarray, out_cache: jnp.ndarray,
                      dirty_idx: jnp.ndarray, dirty_count: jnp.ndarray,
                      g: TileGeometry, *, hint_h: int = 8, hint_w: int = 16,
                      interpret: bool = False):
    """Hint-forwarded pool over the producer's dirty-BLOCK list.

    x: (>=H, >=W, C) producer output (padded Feature data; logical dims
    from g). out_cache: (out_h_pad, out_w_pad, C), donated/aliased.
    dirty_idx: flat ids on the (H/hint_h, W/hint_w) BLOCK grid (the
    caller pairs the 8x8 hint mask in W — hint_w/pool must be a multiple
    of 8 for Mosaic's HBM sublane-slicing rule).
    Returns (new_out_cache, out_tile_mask f32 (tiles_h, tiles_w)).
    Requires an aligned pool: k == s (caller asserts divisibility).
    """
    H, W = g.in_h, g.in_w
    C = x.shape[-1]
    pool = g.stride[0]
    assert g.kernel == (pool, pool) and g.stride == (pool, pool)
    assert hint_h % pool == 0 and hint_w % pool == 0
    assert (hint_w // pool) % 8 == 0, hint_w
    assert W % hint_w == 0 and H % hint_h == 0
    # one-cell mask invariant: the kernel marks a SINGLE (8,8) out-tile
    # cell per dirty block, so each block's pooled extent must tile the
    # out grid — the pooled dims must DIVIDE 8 (1/2/4/8). A hint_w=32,
    # pool=2 geometry passes the %8 Mosaic rule above with a 16-col
    # extent spanning TWO out tiles, leaving the second unmarked (stale
    # consumers). In-repo callers (layers.py fused gate) satisfy this;
    # asserted here so other callers cannot violate it silently.
    assert 8 % (hint_h // pool) == 0, (hint_h, pool)
    assert hint_w // pool == 8, (hint_w, pool)
    blocks_w = W // hint_w

    kern = functools.partial(_fused_pool_kernel, hint_h=hint_h,
                             hint_w=hint_w, blocks_w=blocks_w,
                             tiles_h=g.tiles_h, tiles_w=g.tiles_w, pool=pool)
    out_h = hint_h // pool
    out_w = hint_w // pool
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # x
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # out_cache
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((NBUF, hint_h, hint_w, C), out_cache.dtype),
            pltpu.VMEM((NBUF, out_h, out_w, C), out_cache.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    new_cache, mask = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(out_cache.shape, out_cache.dtype),
            jax.ShapeDtypeStruct((g.tiles_h, g.tiles_w), jnp.float32),
        ],
        input_output_aliases={3: 0},  # out_cache (after 2 scalar args + x)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(dirty_idx, dirty_count.reshape(1), x.astype(out_cache.dtype),
      out_cache)
    return new_cache, mask


def delta_pool_pallas(xp: jnp.ndarray, idx: jnp.ndarray,
                      out_cache: jnp.ndarray, g: TileGeometry, *,
                      count: jnp.ndarray = None,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused gather+maxpool+scatter; out_cache donated/aliased."""
    capacity = idx.shape[0]
    if count is None:
        count = jnp.asarray(capacity, jnp.int32)

    kern = functools.partial(_delta_pool_kernel, g=g)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, g.win_h_dma, g.win_w_dma, g.cin), xp.dtype),
            pltpu.VMEM((NBUF, g.th, g.tw, g.cin), out_cache.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )

    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_cache.shape, out_cache.dtype),
        input_output_aliases={3: 0},  # out_cache (after 2 scalar args + xp)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, count.reshape(1), xp, out_cache)
