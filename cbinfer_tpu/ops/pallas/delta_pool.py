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


def _kernel(idx_ref, m_ref, xp_ref, out_in_ref, out_ref,
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

        y_buf[slot] = y

        out_copy(slot, i).start()

    lax.fori_loop(0, m, body, None)

    for k in range(NBUF):  # drain the last <=NBUF output DMAs
        @pl.when(m - NBUF + k >= 0)
        def _(k=k):
            j = m - NBUF + k
            out_copy(lax.rem(j, NBUF), j).wait()


def delta_pool_pallas(xp: jnp.ndarray, idx: jnp.ndarray,
                      out_cache: jnp.ndarray, g: TileGeometry, *,
                      count: jnp.ndarray = None,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused gather+maxpool+scatter; out_cache donated/aliased."""
    capacity = idx.shape[0]
    if count is None:
        count = jnp.asarray(capacity, jnp.int32)

    kern = functools.partial(_kernel, g=g)

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
