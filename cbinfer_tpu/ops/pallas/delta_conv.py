"""Fused gather -> delta-conv GEMM -> scatter Pallas TPU kernel (C4+C5+C6).

The reference runs three separate CUDA kernels + a cuBLAS call per layer per
frame (sparse im2col gather, SGEMM, scatter — arXiv 1704.04313 §3.3-3.5).
The TPU-native shape is ONE kernel (SURVEY.md §7 M2): scalar-prefetched
changed-tile indices drive data-dependent async DMA of each tile's input
window (incl. receptive-field halo) from the HBM-resident activation cache
into VMEM, the tile conv runs as k_h*k_w shifted MXU matmuls, and the result
tile is DMA-scattered into the output cache, which is input/output-aliased
(donated) so unchanged tiles are never touched — no full-map traffic.

Pipelining: input DMAs are double-buffered one tile ahead of compute; output
DMAs are double-buffered one tile behind. Weights live in VMEM for the whole
kernel ((kh*kw*cin)*cout * 4B; fits for all model-zoo layers).

Strided convs are supported via strided in-VMEM slicing; dilated convs via
dilation-scaled tap offsets in the phase_slice (the gather window already
includes the dilated receptive-field halo from TileGeometry). Both are
covered by tests/test_pallas_kernels.py.
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


def _delta_conv_kernel(idx_ref, m_ref,  # scalar prefetch (SMEM)
            xp_ref, w_ref, b_ref,      # inputs (HBM/ANY, VMEM, VMEM)
            out_in_ref,                # aliased input view of the out buffer
            out_ref,                   # output (HBM/ANY, aliased to out_in)
            win_buf, y_buf, in_sems, out_sems,  # scratch
            *, g: TileGeometry, cout: int, activation: Optional[str],
            compute_dtype, rowstack: bool = False, nbuf: int = 4):
    del out_in_ref  # same memory as out_ref; all access goes through out_ref
    kh, kw = g.kernel
    sh, sw = g.stride
    m = m_ref[0]

    # Lane-unaligned cin keeps UNPADDED lanes: Mosaic cannot slot-slice a
    # VMEM buffer whose minor dim is not a 128-multiple, so the pipeline
    # buffer is ROW-stacked (nbuf*win_h_dma, win_w, C) and selected by a
    # leading-dim offset instead of win_buf[slot]. NOTE: on the current
    # hardware generation this path only runs under interpret=True (kernel
    # unit tests) — Mosaic rejects DMA-slicing of small-lane HBM memrefs
    # outright (probed r2), so layers.py lane-pads every real cache and
    # routes small-cin stems to the dense_cached backend instead.
    def win_at(slot):
        if rowstack:
            return win_buf.at[pl.ds(slot * g.win_h_dma, g.win_h_dma)]
        return win_buf.at[slot]

    def win_val(slot):
        if rowstack:
            return win_buf[pl.ds(slot * g.win_h_dma, g.win_h_dma)]
        return win_buf[slot]

    def in_copy(slot, i):
        t = idx_ref[i]
        ti = t // g.tiles_w
        tj = t - ti * g.tiles_w
        return pltpu.make_async_copy(
            xp_ref.at[pl.ds(ti * g.th * sh, g.win_h_dma),
                      pl.ds(tj * g.tw * sw, g.win_w_dma), :],
            win_at(slot),
            in_sems.at[slot])

    def out_copy(slot, i):
        t = idx_ref[i]
        ti = t // g.tiles_w
        tj = t - ti * g.tiles_w
        return pltpu.make_async_copy(
            y_buf.at[slot],
            out_ref.at[pl.ds(ti * g.th, g.th), pl.ds(tj * g.tw, g.tw), :],
            out_sems.at[slot])

    for k in range(nbuf - 1):  # prolog: fill the DMA pipeline
        @pl.when(k < m)
        def _(k=k):
            in_copy(k, k).start()

    def body(i, _):
        slot = lax.rem(i, nbuf)

        # keep nbuf-1 input DMAs in flight ahead of compute (the per-tile
        # work is small enough that 2 slots leave the loop latency-bound)
        @pl.when(i + nbuf - 1 < m)
        def _():
            in_copy(lax.rem(i + nbuf - 1, nbuf), i + nbuf - 1).start()

        in_copy(slot, i).wait()

        win = win_val(slot).astype(compute_dtype)
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

        # the out DMA issued nbuf iterations ago used this slot; drain it
        # before overwriting y_buf[slot]
        @pl.when(i >= nbuf)
        def _():
            out_copy(slot, i - nbuf).wait()

        y_buf[slot] = acc.reshape(g.th, g.tw, cout).astype(y_buf.dtype)
        out_copy(slot, i).start()

    lax.fori_loop(0, m, body, None)

    for k in range(nbuf):  # drain the last <=nbuf output DMAs
        @pl.when(m - nbuf + k >= 0)
        def _(k=k):
            j = m - nbuf + k
            out_copy(lax.rem(j, nbuf), j).wait()


def delta_conv_pallas(xp: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray,
                      b: Optional[jnp.ndarray], out_cache: jnp.ndarray,
                      g: TileGeometry, activation: Optional[str],
                      compute_dtype=jnp.float32, *, count: jnp.ndarray = None,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused C4+C5+C6. Args mirror delta_conv_jnp plus the true tile count.

    xp: (Hp, Wp, cin) padded input cache; idx: (capacity,) changed-tile ids
    (sentinel-padded); count: () int32 number of valid entries (defaults to
    capacity); out_cache: (out_h_pad, out_w_pad, cout), DONATED and aliased
    into the result — unchanged tiles are never copied.
    """
    kh, kw = g.kernel
    cout = w.shape[-1]
    capacity = idx.shape[0]
    if count is None:
        count = jnp.asarray(capacity, jnp.int32)
    if b is None:
        b = jnp.zeros((cout,), w.dtype)

    # lane-unaligned cin (3-channel stems, narrow test nets) => row-stacked
    # input double buffer (see _delta_conv_kernel.win_at)
    rowstack = g.cin % 128 != 0
    NBUF = 4  # DMA pipeline depth (see ops/pallas/detect.NBUF)
    kern = functools.partial(
        _delta_conv_kernel, g=g, cout=cout, activation=activation,
        compute_dtype=compute_dtype, rowstack=rowstack, nbuf=NBUF)

    flops_per_tile = 2 * g.th * g.tw * kh * kw * g.cin * cout
    cache_dtype = out_cache.dtype

    win_scratch = (
        pltpu.VMEM((NBUF * g.win_h_dma, g.win_w_dma, g.cin), xp.dtype)
        if rowstack else
        pltpu.VMEM((NBUF, g.win_h_dma, g.win_w_dma, g.cin), xp.dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),       # xp stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias (1, cout)
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),       # out_cache (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            win_scratch,
            pltpu.VMEM((NBUF, g.th, g.tw, cout), cache_dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )

    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_cache.shape, cache_dtype),
        input_output_aliases={5: 0},  # out_cache -> output 0: flat
                                      # operand index 5 = 2 scalar-prefetch
                                      # args (idx, m) + tensor args
                                      # (xp, w, b, OUT_CACHE)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=int(flops_per_tile) * capacity,
            bytes_accessed=(capacity
                            * (g.win_h * g.win_w * g.cin
                               + g.th * g.tw * cout) * 4
                            + w.size * 4),
            transcendentals=0),
        interpret=interpret,
    )(idx, count.reshape(1), xp, w.astype(compute_dtype),
      b.reshape(1, cout).astype(jnp.float32), out_cache)
