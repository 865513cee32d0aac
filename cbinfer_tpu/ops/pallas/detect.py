"""Change-detection Pallas kernels (C1+C2 fused): producer-driven sparse.

Reference: one CUDA thread per pixel compares the incoming map against the
cached map and updates the cache at changed pixels (arXiv 1704.04313 §3.1),
then a second kernel dilates the change map by the receptive field
(1808.05488 §IV-B).

TPU-native design (``detect_sparse``): a pixel whose diff exceeded tau last
frame was ACCEPTED last frame (diff now 0), and a pixel not recomputed by
the producer layer is bit-identical to last frame — so ONLY pixels inside
the producer's recomputed tiles can be changed now. The kernel walks the
producer's compacted dirty-tile list (scalar prefetch), DMAs x/cache only
there, updates the cache there, and — instead of materializing a pixel mask
— FUSES the receptive-field dilation: per dirty tile it projects changed
pixels onto rows/columns and marks the affected output tiles of THIS layer
directly in a VMEM-resident (tiles_h, tiles_w) mask, written once at the
end. Detection cost is proportional to the change rate, not the frame area.

The fused dilation is EXACT: per hint tile, the affected-output-tile block
is sum_{r,c} M1[a,r] * changed[r,c] * M2[c,b] > 0 with window-indicator
matrices M1/M2 — two tiny MXU matmuls, no pixel mask ever touches HBM.

Alignment notes (Mosaic): (H, W, C) slices need 8-aligned W offsets/sizes
and full C — hint tiles are 8x8 with W % 8 == 0 enforced by the caller;
H edges use clamped (overlapping) origins, legal because detection and
cache update are idempotent per pixel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import TileGeometry
from .common import hint_origin

HINT = 8  # hint tile side (pixels); fixed across the framework


def _band_kernel(x_ref, cache_in_ref, tau_ref,        # inputs (HBM, HBM, SMEM)
                 cache_ref, mask_ref, npix_ref,       # outputs
                 xbuf, cbuf, wbuf, macc, in_sems, out_sems,
                 *, g: TileGeometry, Wc: int, nbands: int,
                 nchunks: int):
    """Full-map detect+update+dilate, swept in (8, Wc) tiles with
    double-buffered DMA. Used when a layer has no producer hint."""
    del cache_in_ref  # aliased with cache_ref
    n = nbands * nchunks

    def origins(t):
        i = t // nchunks
        j = t - i * nchunks
        return i * HINT, j * Wc

    def copy_in(slot, t, which):
        oy, ox = origins(t)
        if which == 0:
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(oy, HINT), pl.ds(ox, Wc), :],
                xbuf.at[slot], in_sems.at[slot, which])
        return pltpu.make_async_copy(
            cache_ref.at[pl.ds(g.store_lo_h + oy, HINT),
                         pl.ds(g.store_lo_w + ox, Wc), :],
            cbuf.at[slot], in_sems.at[slot, which])

    def copy_out(slot, t):
        oy, ox = origins(t)
        return pltpu.make_async_copy(
            wbuf.at[slot],
            cache_ref.at[pl.ds(g.store_lo_h + oy, HINT),
                         pl.ds(g.store_lo_w + ox, Wc), :],
            out_sems.at[slot])

    macc[:] = jnp.zeros_like(macc)
    npix_ref[0] = 0
    copy_in(0, 0, 0).start()
    copy_in(0, 0, 1).start()

    def body(t, _):
        slot = lax.rem(t, 2)

        @pl.when(t + 1 < n)
        def _():
            copy_in(1 - slot, t + 1, 0).start()
            copy_in(1 - slot, t + 1, 1).start()

        copy_in(slot, t, 0).wait()
        copy_in(slot, t, 1).wait()

        x8 = xbuf[slot]
        c8 = cbuf[slot]
        diff = jnp.max(jnp.abs(x8.astype(jnp.float32)
                               - c8.astype(jnp.float32)), axis=-1)
        changed = diff > tau_ref[0]                  # (8, Wc)
        npix_ref[0] += jnp.sum(changed.astype(jnp.int32))

        @pl.when(t >= 2)
        def _():
            copy_out(slot, t - 2).wait()

        wbuf[slot] = jnp.where(changed[..., None], x8, c8)
        copy_out(slot, t).start()

        # exact dilation via indicator matmuls (see _sparse_kernel)
        oy, ox = origins(t)
        a_start = (jax.lax.broadcasted_iota(jnp.int32, (g.tiles_h, HINT), 0)
                   * (g.th * g.stride[0]) - g.pad_lo_h)
        r_ids = (jax.lax.broadcasted_iota(jnp.int32, (g.tiles_h, HINT), 1)
                 + oy)
        m1 = ((a_start <= r_ids) & (r_ids < a_start + g.win_h)
              ).astype(jnp.float32)
        b_start = (jax.lax.broadcasted_iota(jnp.int32, (Wc, g.tiles_w), 1)
                   * (g.tw * g.stride[1]) - g.pad_lo_w)
        c_ids = (jax.lax.broadcasted_iota(jnp.int32, (Wc, g.tiles_w), 0)
                 + ox)
        m2 = ((b_start <= c_ids) & (c_ids < b_start + g.win_w)
              ).astype(jnp.float32)
        # m1 @ (changed @ m2): contract the wide Wc dim first (the
        # other association costs ~10x — r3 probe)
        contrib = jnp.dot(m1, jnp.dot(changed.astype(jnp.float32), m2,
                                      preferred_element_type=jnp.float32),
                          preferred_element_type=jnp.float32)
        macc[:] = jnp.maximum(macc[:], (contrib > 0).astype(jnp.float32))

    lax.fori_loop(0, n, body, None)

    @pl.when(n >= 2)
    def _():
        copy_out(lax.rem(n, 2), n - 2).wait()

    copy_out(lax.rem(n - 1, 2), n - 1).wait()
    mask_ref[:] = macc[:]


def detect_full_pallas(x: jnp.ndarray, in_cache: jnp.ndarray, tau,
                       g: TileGeometry, *, interpret: bool = False,
                       vmem_budget: int = 10 * 2**20):
    """Fused full-map detect (C1+C2) for hint-less layers: one banded sweep
    reads x + cache, updates the cache in place (aliased storage), and
    accumulates the dilated changed-OUT-TILE mask in VMEM — replacing 3-4
    separate XLA full-map passes. Bands are column-chunked to fit VMEM.
    Returns (storage', mask f32, npix (1,))."""
    H, W = g.in_h, g.in_w
    C = x.shape[-1]
    assert W % 8 == 0 and H % HINT == 0, (H, W)
    nbands = H // HINT
    itemsize = jnp.dtype(in_cache.dtype).itemsize
    # largest divisor-of-W chunk width (multiple of 8) whose band fits the
    # VMEM budget. Halving alone dead-ends on odd multiples of 8 (W=520
    # can never halve to a lane-valid 260); Wc=8 always exists (W%8==0),
    # so the fallback is a narrow chunk, never a VMEM blowout.
    Wc = next(c for c in range(W, 7, -8)
              if W % c == 0
              and 6 * HINT * c * C * itemsize <= vmem_budget) \
        if 6 * HINT * 8 * C * itemsize <= vmem_budget else 8
    nchunks = W // Wc
    kern = functools.partial(_band_kernel, g=g, Wc=Wc, nbands=nbands,
                             nchunks=nchunks)
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
            pltpu.VMEM((2, HINT, Wc, C), in_cache.dtype),
            pltpu.VMEM((2, HINT, Wc, C), in_cache.dtype),
            pltpu.VMEM((2, HINT, Wc, C), in_cache.dtype),
            pltpu.VMEM((g.tiles_h, g.tiles_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(x.astype(in_cache.dtype), in_cache, jnp.asarray([tau], jnp.float32))
    return new_cache, mask, npix


NBUF = 4  # DMA pipeline depth of the sparse kernels: the per-tile work is
# tiny (a 16 KB tile DMA + sub-us vector work), so with 2 slots the loop
# is DMA-LATENCY-bound; 4 slots keep more copies in flight


def _sparse_kernel(idx_ref, m_ref,                    # scalar prefetch
                   x_ref, cache_in_ref, tau_ref,      # tensors
                   cache_ref, mask_ref, npix_ref,     # outputs
                   xbuf, cbuf, wbuf, in_sems, out_sems,  # scratch
                   *, H: int, W: int, hint_tiles_w: int,
                   g: TileGeometry):
    del cache_in_ref  # aliased with cache_ref
    m = m_ref[0]
    sh, sw = g.stride

    def origins(i):
        """Logical pixel origin of hint tile i (clamped H edge; W aligned —
        shared decode, see common.hint_origin)."""
        oy, ox, _ = hint_origin(idx_ref[i], hint_tiles_w, H, HINT)
        return oy, ox

    def copy_in(slot, i, which):
        oy, ox = origins(i)
        if which == 0:
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(oy, HINT), pl.ds(ox, HINT), :],
                xbuf.at[slot], in_sems.at[slot, which])
        # cache is the spatially-padded storage: interior starts at
        # (store_lo_h, store_lo_w); store_lo_w is 8-aligned so ox stays legal
        return pltpu.make_async_copy(
            cache_ref.at[pl.ds(g.store_lo_h + oy, HINT),
                         pl.ds(g.store_lo_w + ox, HINT), :],
            cbuf.at[slot], in_sems.at[slot, which])

    def copy_out(slot, i):
        oy, ox = origins(i)
        return pltpu.make_async_copy(
            wbuf.at[slot],
            cache_ref.at[pl.ds(g.store_lo_h + oy, HINT),
                         pl.ds(g.store_lo_w + ox, HINT), :],
            out_sems.at[slot])

    mask_ref[:] = jnp.zeros_like(mask_ref)
    npix_ref[0] = 0

    for k in range(NBUF - 1):  # prolog: fill the pipeline
        @pl.when(k < m)
        def _(k=k):
            copy_in(k, k, 0).start()
            copy_in(k, k, 1).start()

    def body(i, _):
        slot = lax.rem(i, NBUF)

        @pl.when(i + NBUF - 1 < m)
        def _():
            nslot = lax.rem(i + NBUF - 1, NBUF)
            copy_in(nslot, i + NBUF - 1, 0).start()
            copy_in(nslot, i + NBUF - 1, 1).start()

        copy_in(slot, i, 0).wait()
        copy_in(slot, i, 1).wait()

        x8 = xbuf[slot]
        c8 = cbuf[slot]
        diff = jnp.max(jnp.abs(x8.astype(jnp.float32)
                               - c8.astype(jnp.float32)), axis=-1)  # (8, 8)
        changed = diff > tau_ref[0]
        # count only rows in THIS tile's nominal range: a clamped
        # bottom-edge tile overlaps the previous tile's rows, and whether
        # the overlap diff sees pre- or post-update cache bytes depends
        # on DMA timing — counting it would make npix nondeterministic
        # on hardware (cache bytes and the mask stay exact either way)
        _oy, _ox, _hi = hint_origin(idx_ref[i], hint_tiles_w, H, HINT)
        skip = _hi * HINT - _oy
        own_rows = jax.lax.broadcasted_iota(jnp.int32, (HINT, HINT), 0) \
            >= skip
        npix_ref[0] += jnp.sum((changed & own_rows).astype(jnp.int32))

        # ---- cache update (write-back through a separate buffer) ----
        @pl.when(i >= NBUF)
        def _():
            copy_out(slot, i - NBUF).wait()

        wbuf[slot] = jnp.where(changed[..., None], x8, c8)
        copy_out(slot, i).start()

        # ---- fused dilation: mark affected output tiles of this layer ----
        # Out tile (a, b) reads unpadded input rows [a*th*sh - pad_lo_h,
        # +win_h) x cols likewise; it is affected iff a changed pixel lies
        # in that window. Computed EXACTLY as two tiny matmuls with window-
        # indicator matrices (pure vector/MXU ops — Mosaic has no lane
        # broadcast of vector-derived scalars):
        #   contrib[a, b] = sum_{r,c} M1[a,r] * changed[r,c] * M2[c,b] > 0
        oy, ox = origins(i)
        a_start = (jax.lax.broadcasted_iota(jnp.int32, (g.tiles_h, HINT), 0)
                   * (g.th * sh) - g.pad_lo_h)
        r_ids = jax.lax.broadcasted_iota(jnp.int32, (g.tiles_h, HINT), 1) + oy
        m1 = ((a_start <= r_ids) & (r_ids < a_start + g.win_h)
              ).astype(jnp.float32)
        b_start = (jax.lax.broadcasted_iota(jnp.int32, (HINT, g.tiles_w), 1)
                   * (g.tw * sw) - g.pad_lo_w)
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (HINT, g.tiles_w), 0) + ox
        m2 = ((b_start <= c_ids) & (c_ids < b_start + g.win_w)
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
            copy_out(lax.rem(j, NBUF), j).wait()


def detect_sparse(x: jnp.ndarray, in_cache: jnp.ndarray, tau,
                  dirty_idx: jnp.ndarray, dirty_count: jnp.ndarray,
                  g: TileGeometry, *, interpret: bool = False):
    """Detect+update+dilate restricted to the producer's dirty tiles.

    Args:
      x: (H, W, C) current input (the producer's cropped output).
      in_cache: (H, W, C) accepted-value cache, aliased/donated.
      dirty_idx / dirty_count: compacted dirty-hint tile list on the 8x8
        hint grid of THIS input (ids = hi * ceil(W/8) + hj).
      g: this layer's output tile geometry.

    Returns (new_cache, out_tile_mask f32 (tiles_h, tiles_w),
             changed_pixels int32 (1,)).

    ``x`` may be spatially padded beyond the logical (g.in_h, g.in_w);
    only logical coordinates are read.
    """
    H, W = g.in_h, g.in_w
    C = x.shape[-1]
    assert W % HINT == 0 and H >= HINT, (x.shape, H, W)
    hint_tiles_w = -(-W // HINT)
    tau_arr = jnp.asarray([tau], jnp.float32)

    kern = functools.partial(_sparse_kernel, H=H, W=W,
                             hint_tiles_w=hint_tiles_w, g=g)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # x
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # in_cache
            pl.BlockSpec(memory_space=pltpu.SMEM),             # tau
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # cache
            pl.BlockSpec(memory_space=pltpu.VMEM),             # tile mask
            pl.BlockSpec(memory_space=pltpu.SMEM),             # changed px
        ],
        scratch_shapes=[
            # in_cache.dtype, NOT x.dtype: the x operand below is
            # x.astype(in_cache.dtype), so a float32 x into a bf16 cache
            # would otherwise declare a mismatched DMA destination
            pltpu.VMEM((NBUF, HINT, HINT, C), in_cache.dtype),
            pltpu.VMEM((NBUF, HINT, HINT, C), in_cache.dtype),
            pltpu.VMEM((NBUF, HINT, HINT, C), in_cache.dtype),
            pltpu.SemaphoreType.DMA((NBUF, 2)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    new_cache, mask, npix = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(in_cache.shape, in_cache.dtype),
            jax.ShapeDtypeStruct((g.tiles_h, g.tiles_w), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(dirty_idx, dirty_count.reshape(1), x.astype(in_cache.dtype), in_cache,
      tau_arr)
    return new_cache, mask, npix
