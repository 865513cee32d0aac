"""Hinted tile-copy ("accept") kernel for CB17 mask-forwarding conv layers.

In forwarding mode (config.ConvSpec.forward_hint) a layer's input cache
must simply TRACK the producer's output over the dirty region — no diff,
no threshold, no mask computation (the mask is the hint dilated by the
receptive field, done in XLA on the tiny tile grids; layers._forward_mask).
This kernel walks the producer's compacted dirty-tile list (scalar
prefetch) and copies each 8x8 tile from the producer's output into the
spatially-padded input storage: pure data movement, 2x the dirty-region
traffic where re-detection pays 3x (read x, read cache, write cache) plus
mask matmuls.

Induction invariant: a tile absent from every hint since it last appeared
is bit-identical in x and storage (the producer never recomputed it), so
copying ONLY hinted tiles keeps storage == padded producer output
everywhere — the same argument that makes dirty-hint detection sound
(layers.py module doc).

Copies are HBM->VMEM->HBM through a small rotating buffer (NBUF slots,
same DMA-pipeline shape as ops/pallas/detect._sparse_kernel).
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

HINT = 8
NBUF = 4


def _accept_kernel(idx_ref, m_ref,            # scalar prefetch
                   x_ref, cache_in_ref,       # inputs (HBM, HBM aliased)
                   cache_ref,                 # output (aliased)
                   buf, wbuf, in_sems, out_sems,
                   *, H: int, W: int, hint_tiles_w: int, g: TileGeometry):
    del cache_in_ref  # aliased with cache_ref
    m = m_ref[0]

    def origins(i):
        oy, ox, _ = hint_origin(idx_ref[i], hint_tiles_w, H, HINT)
        return oy, ox

    def copy_in(slot, i):
        oy, ox = origins(i)
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(oy, HINT), pl.ds(ox, HINT), :],
            buf.at[slot], in_sems.at[slot])

    def copy_out(slot, i):
        oy, ox = origins(i)
        return pltpu.make_async_copy(
            wbuf.at[slot],
            cache_ref.at[pl.ds(g.store_lo_h + oy, HINT),
                         pl.ds(g.store_lo_w + ox, HINT), :],
            out_sems.at[slot])

    for k in range(NBUF - 1):
        @pl.when(k < m)
        def _(k=k):
            copy_in(k, k).start()

    def body(i, _):
        slot = lax.rem(i, NBUF)

        # Prefetch into slot (i-1)%NBUF: its previous tenant (tile i-1)
        # was vector-copied to wbuf at iteration i-1, so the in-DMA never
        # overlaps a live reader of buf[nslot].
        @pl.when(i + NBUF - 1 < m)
        def _():
            copy_in(lax.rem(i + NBUF - 1, NBUF), i + NBUF - 1).start()

        copy_in(slot, i).wait()

        # Out-copies read ONLY wbuf (in- and out-DMAs never share a slot
        # — the same discipline as detect._sparse_kernel; sharing buf as
        # both DMA source and destination raced: the in-copy for tile
        # i+NBUF-1 started NBUF-1 iterations before the out-copy of the
        # slot's previous tenant was waited). Overwrite wbuf[slot] only
        # after its in-flight out-copy completes.
        @pl.when(i >= NBUF)
        def _():
            copy_out(slot, i - NBUF).wait()

        wbuf[slot] = buf[slot]
        copy_out(slot, i).start()

    lax.fori_loop(0, m, body, None)

    for k in range(NBUF):
        @pl.when(m - NBUF + k >= 0)
        def _(k=k):
            j = m - NBUF + k
            copy_out(lax.rem(j, NBUF), j).wait()


def accept_tiles(x: jnp.ndarray, in_cache: jnp.ndarray,
                 dirty_idx: jnp.ndarray, dirty_count: jnp.ndarray,
                 g: TileGeometry, *, interpret: bool = False) -> jnp.ndarray:
    """Copy the hinted 8x8 tiles of ``x`` into the padded storage.

    x: (>=H, >=W, C) producer output (padded Feature data; logical dims
    from g). in_cache: spatially-padded storage, donated/aliased.
    dirty_idx/dirty_count: compacted hint-tile list (ids on the 8x8 grid
    of the logical input). Returns the updated storage.
    """
    H, W = g.in_h, g.in_w
    C = x.shape[-1]
    assert W % HINT == 0 and H >= HINT, (x.shape, H, W)
    hint_tiles_w = -(-W // HINT)

    kern = functools.partial(_accept_kernel, H=H, W=W,
                             hint_tiles_w=hint_tiles_w, g=g)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # x
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # in_cache
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, HINT, HINT, C), in_cache.dtype),  # buf (in)
            pltpu.VMEM((NBUF, HINT, HINT, C), in_cache.dtype),  # wbuf (out)
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(in_cache.shape, in_cache.dtype),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(dirty_idx, dirty_count.reshape(1), x.astype(in_cache.dtype), in_cache)
