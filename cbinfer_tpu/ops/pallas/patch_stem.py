"""Fused-assembly sparse STEM kernel: flat4 window -> in-VMEM im2col ->
block-diagonal MXU conv -> aliased scatter (C1/C4/C5/C6 for cin<=3 stems).

The reference's first layer is an ordinary CUDA delta-conv (arXiv
1704.04313 §3.3-3.5); on TPU the cin=3 stem resisted every delta
formulation (RESULTS.md negative results) and shipped as ``dense_cached``
— a full dense conv every frame, ~60% of the 720p scene frame. This
kernel closes that last gap. Per changed (8-row, 32-px) output tile:

  1. DMA ``rt = flat4[8*ti : 8*ti+16, 128*tj : 128*tj+256]`` (8 KB), the
     tile's input window incl. the 3x3 halo — offsets aligned by the
     flat4 layout (ops/flat4.py), pipelined 4 deep like delta_conv.
  2. Assemble packed im2col patches IN VMEM with three 0/1 selection
     matmuls: ``acc = sum_dy rt[dy:dy+8] @ T_dy`` where
     T_dy (256, 1024) places input lane 16j + 4*(k+dx) + c at patch lane
     128j + 32k + ((3dy+dx)*cin + c). Each patch lane receives exactly
     one nonzero product (1.0 x bf16 value) accumulated in f32 — EXACT,
     so the assembly is a pure relayout at MXU speed. Each pixel's
     kh*kw*cin taps are CONTIGUOUS patch lanes in (dy, dx, c) order: the
     MXU's f32 reduction then groups terms exactly like the shipped
     im2col dense stem, making the conv BIT-IDENTICAL to it (the
     scattered-layout variant measured 1-ulp diffs; probe_fused_stem.py).
  3. ``win(64, 128) @ Wp(128, 4*cout_pad)`` block-diagonal conv dot
     (4 pixels share the 128-lane patch row; zero pad lanes contribute
     exact +0.0), bias + activation in f32.
  4. DMA-scatter the (8, 32, cout_pad) tile into the input/output-aliased
     out cache — untouched tiles keep bit-identical values.

Measured (probe_fused_stem.py, 720p cin=3 cout=128 bf16): 0.126 / 0.320 /
0.616 ms at 5 / 15 / 30% tile density vs 0.628 ms for the shipped dense
stem conv; bit-identical output, real scene stem density ~5%.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..flat4 import CP, TILE_H, TILE_W, WIN_L, WIN_R, Flat4Geom

NBUF = 4  # DMA pipeline depth (matches delta_conv)
GP = TILE_W // 8  # pixels sharing one 128-lane patch row (4)


@functools.lru_cache(maxsize=None)
def _selection_mats_np(cin: int) -> np.ndarray:
    """(3, WIN_L, 1024) 0/1 selection matrices (see module doc)."""
    t = np.zeros((3, WIN_L, 1024), np.float32)
    for dy in range(3):
        for j in range(8):          # patch groups (8 per tile row)
            for k in range(GP):     # pixel within group
                for dx in range(3):
                    for c in range(cin):
                        q = 16 * j + CP * (k + dx) + c
                        lane = 128 * j + 32 * k + (3 * dy + dx) * cin + c
                        t[dy, q, lane] = 1.0
    return t


def pack_patch_weights(w: jnp.ndarray, b: Optional[jnp.ndarray],
                       cout_pad: int, dtype):
    """(3,3,cin,cout) weights -> block-diag Wp (128, GP*cout_pad) + bias.

    Patch row 32k + (3dy+dx)*cin + c feeds output column block k — the
    same kron(I_GP, im2col-matrix) structure the probe validated.
    """
    kh, kw, cin, cout = w.shape
    # round weights AND bias through the compute dtype first — the dense
    # twin computes with w.astype(compute), b.astype(compute), and the
    # f32-held bias of a genuinely-f32 checkpoint differs from its bf16
    # rounding by an ulp (measured: 0.07% of stem outputs moved 1-2 ulp
    # until the bias was rounded identically)
    wf = w.astype(dtype).astype(jnp.float32).reshape(kh * kw * cin, cout)
    wf = jnp.pad(wf, ((0, 32 - kh * kw * cin), (0, cout_pad - cout)))
    wp = jnp.kron(jnp.eye(GP, dtype=jnp.float32), wf)
    bf = (jnp.zeros((cout,), jnp.float32) if b is None
          else b.astype(dtype).astype(jnp.float32))
    bp = jnp.tile(jnp.pad(bf, (0, cout_pad - cout)), GP)
    return wp.astype(dtype), bp


def _patch_stem_kernel(idx_ref, m_ref, f4_ref, t_ref, w_ref, b_ref,
                       out_in_ref, out_ref, win_buf, y_buf, in_sems,
                       out_sems, *, tiles_w: int, cout_pad: int,
                       activation: Optional[str]):
    del out_in_ref  # aliased; all access through out_ref
    m = m_ref[0]

    def in_copy(slot, i):
        t = idx_ref[i]
        ti = t // tiles_w
        tj = t - ti * tiles_w
        return pltpu.make_async_copy(
            f4_ref.at[pl.ds(ti * TILE_H, WIN_R), pl.ds(tj * 128, WIN_L)],
            win_buf.at[slot], in_sems.at[slot])

    def out_copy(slot, i):
        t = idx_ref[i]
        ti = t // tiles_w
        tj = t - ti * tiles_w
        return pltpu.make_async_copy(
            y_buf.at[slot],
            out_ref.at[pl.ds(ti * TILE_H, TILE_H),
                       pl.ds(tj * TILE_W, TILE_W), :],
            out_sems.at[slot])

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
        rt = win_buf[slot]
        acc = jnp.dot(rt[0:8], t_ref[0], preferred_element_type=jnp.float32)
        acc += jnp.dot(rt[1:9], t_ref[1], preferred_element_type=jnp.float32)
        acc += jnp.dot(rt[2:10], t_ref[2],
                       preferred_element_type=jnp.float32)
        win = acc.astype(rt.dtype).reshape(64, 128)
        y = jnp.dot(win, w_ref[...], preferred_element_type=jnp.float32)
        y = y + b_ref[0]
        if activation == "relu":
            y = jnp.maximum(y, 0.0)

        @pl.when(i >= NBUF)
        def _():
            out_copy(slot, i - NBUF).wait()

        y_buf[slot] = y.reshape(TILE_H, TILE_W, cout_pad).astype(y_buf.dtype)
        out_copy(slot, i).start()

    lax.fori_loop(0, m, body, None)

    for k in range(NBUF):
        @pl.when(m - NBUF + k >= 0)
        def _(k=k):
            j = m - NBUF + k
            out_copy(lax.rem(j, NBUF), j).wait()


def patch_stem_conv(flat4: jnp.ndarray, idx: jnp.ndarray,
                    count: jnp.ndarray, w: jnp.ndarray,
                    b: Optional[jnp.ndarray], out_cache: jnp.ndarray,
                    fg: Flat4Geom, activation: Optional[str],
                    compute_dtype, interpret: bool = False) -> jnp.ndarray:
    """Recompute the changed stem tiles listed in idx[:count] into the
    aliased out_cache. idx entries beyond count are sentinels (never
    read — the tile loop bounds by count)."""
    assert flat4.shape == (fg.fh, fg.fl), (flat4.shape, fg)
    assert out_cache.shape[:2] == (fg.tiles_h * TILE_H,
                                   fg.tiles_w * TILE_W), \
        (out_cache.shape, fg)
    cout_pad = out_cache.shape[-1]
    cdt = jnp.dtype(compute_dtype)
    t = jnp.asarray(_selection_mats_np(fg.cin), cdt)
    wp, bp = pack_patch_weights(w, b, cout_pad, cdt)
    kern = functools.partial(_patch_stem_kernel, tiles_w=fg.tiles_w,
                             cout_pad=cout_pad, activation=activation)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # flat4
            pl.BlockSpec(memory_space=pltpu.VMEM),             # T
            pl.BlockSpec(memory_space=pltpu.VMEM),             # Wp
            pl.BlockSpec(memory_space=pltpu.VMEM),             # bias
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # out alias
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, WIN_R, WIN_L), cdt),
            pltpu.VMEM((NBUF, TILE_H, TILE_W, cout_pad), out_cache.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_cache.shape, out_cache.dtype),
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 64 * 128 * (1024 * 3 + GP * cout_pad)
            * idx.shape[0] // 64,
            bytes_accessed=idx.shape[0]
            * (WIN_R * WIN_L + TILE_H * TILE_W * cout_pad) * 2,
            transcendentals=0),
    )(idx, count.reshape(1), flat4.astype(cdt), t, wp,
      bp.reshape(1, -1), out_cache)
