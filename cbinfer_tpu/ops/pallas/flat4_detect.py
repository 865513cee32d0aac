"""Fused full-map detect+accept+dilate on the FLAT4 stem cache (C1+C2).

The patch_stem backend's detect chain ran as XLA ops on the flat4 buffer
(flat4.detect_accept_flat4 + three changed_tile_mask reductions): measured
~262 us/frame of the 824 us 720p scene frame (r3-final trace) — a diff
reduce (53 us), the lane-repeat mask broadcast+reshape (48 us), the
to_flat4 pad (26 us), the select write, and the tile-mask reduce_windows,
each a separate full-map HBM pass. This kernel does the whole chain in ONE
banded sweep (the _band_kernel pattern, detect.py:45, on rank-2 flat4).

Three measured design rules (v1 of this kernel ran 136 us/frame — still
compute-bound; this version targets the ~40 us DMA floor):

  * EARLY-OUT per band: a single full-band max decides whether ANY pixel
    can pass tau (per-lane max >= per-pixel group max); clean bands skip
    the group-max tree, the accept select, AND the write-back DMA
    entirely (the cache is aliased — not writing IS keeping). At the
    measured ~5-15% 720p change rates most bands are clean.
  * Group-of-4 lane max via MASKED LANE ROTATIONS arranged as a tree
    (4 rolls, not 6; no rank-3 reshape — Mosaic relayouts cost more).
  * NO per-band matmuls: per-band row-ORs land in two (nbands, fl)
    accumulators via dynamic single-sublane stores, and ONE well-shaped
    (cells_h, fl) @ (fl, cells_w) MXU dot after the sweep produces the
    dilated cell mask (v1's per-band (8,fl)@(fl,160) dots were M=8
    skinny — ~6% MXU utilization, ~50 us/frame).

Row bookkeeping behind the end dot: flat band t holds pixel rows
CELL*t-1 .. CELL*t+6, so cell row i's input window [CELL*i-1, CELL*i+9)
is exactly (all 8 rows of band i) UNION (rows 0-1 of band i+1):
cell_or[i] = rowA[i] | rowB[i+1] with rowA = OR over the band's 8 rows,
rowB = OR over its first 2.

Exactness: bit-identical accepted cache, npix, and 8x8-cell dilated mask
vs the XLA chain (tests/test_patch_stem.py), including tau < 0 (the
all-changed refresh semantics — margin lanes/rows pass the tau test with
diff 0 and are gated out of npix/mask; the accept select may touch them
but writes identical zero bytes). The only remaining XLA op is the
to_flat4(x, f32) pad that shapes the unrounded input (detect compares
f32 x vs f32 cache — flat4.detect_accept_flat4 doc).

Reference: arXiv 1704.04313 §3.1 (per-pixel detect/accept) + 1808.05488
§IV-B (receptive-field dilation), fused TPU-style.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..flat4 import CP, Flat4Geom

CELL = 8          # dilated-mask cell side (pixels) == layers.HINT_TILE


def _kernel(x4_ref, cache_in_ref, tau_ref, t_ref,     # HBM, HBM, SMEM, SMEM
            cache_ref, mask_ref, npix_ref,            # HBM(aliased), VMEM, SMEM
            xbuf, cbuf, wbuf, rowa, rowb, stage_a, stage_b, m2buf, wrote,
            in_sems, out_sems,
            *, fg: Flat4Geom, cells_h: int, cells_w: int,
            pad_lo: int, win: int, clip_mode: bool):
    del cache_in_ref  # aliased with cache_ref
    fh, fl = fg.fh, fg.fl
    nbands = fh // CELL  # == cells_h + 1 (one row of top/bottom margin)
    ngroups = -(-nbands // 8)
    # clip mode: x4_ref is the whole (T, fh, fl) chunk resident in HBM;
    # bands DMA straight out of frame t_ref[0] (runner ingest form — no
    # per-frame slice/pad ever materializes in XLA)
    xsrc = x4_ref.at[t_ref[0]] if clip_mode else x4_ref

    def copy_in(slot, t, which):
        if which == 0:
            return pltpu.make_async_copy(
                xsrc.at[pl.ds(t * CELL, CELL), :],
                xbuf.at[slot], in_sems.at[slot, which])
        return pltpu.make_async_copy(
            cache_ref.at[pl.ds(t * CELL, CELL), :],
            cbuf.at[slot], in_sems.at[slot, which])

    def copy_out(slot, t):
        return pltpu.make_async_copy(
            wbuf.at[slot],
            cache_ref.at[pl.ds(t * CELL, CELL), :],
            out_sems.at[slot])

    def drain(slot):
        """Wait the slot's pending write-back, if any (conditional
        write-backs make a static wait schedule impossible; wrote[slot]
        holds 1 + band index of the in-flight copy, 0 = none)."""
        @pl.when(wrote[slot] > 0)
        def _():
            copy_out(slot, wrote[slot] - 1).wait()
            wrote[slot] = 0

    # hoisted lane -> cell-column window indicator for the end dot:
    # m2[l, j] = 1 iff the pixel column of lane l (= l//CP - 1; margin
    # and c>=cin lanes are gated by the validity terms) lies in cell
    # column j's input window [CELL*j - pad_lo, CELL*j - pad_lo + win)
    pc = lax.broadcasted_iota(jnp.int32, (fl, cells_w), 0) // CP - 1
    j0 = lax.broadcasted_iota(jnp.int32, (fl, cells_w), 1) * CELL - pad_lo
    m2buf[:] = ((j0 <= pc) & (pc < j0 + win)
                & (0 <= pc) & (pc < fg.w)).astype(jnp.bfloat16)

    rowa[:] = jnp.zeros_like(rowa)
    rowb[:] = jnp.zeros_like(rowb)
    npix_ref[0] = 0
    wrote[0] = 0
    wrote[1] = 0
    copy_in(0, 0, 0).start()
    copy_in(0, 0, 1).start()

    lane_iota = lax.broadcasted_iota(jnp.int32, (CELL, fl), 1)
    lane_r = lax.rem(lane_iota, CP)
    lane_valid = (lane_iota >= CP) & (lane_iota < CP * (fg.w + 1))
    sub_iota = lax.broadcasted_iota(jnp.int32, (CELL, fl), 0)

    # Mosaic cannot prove 8-alignment of a dynamic single-sublane store,
    # so per-band row-ORs stage into an (8, fl) buffer at a STATIC row
    # (iota-select) and flush to rowa/rowb once per 8-band group at a
    # provably aligned offset (8 * group index).
    def group_body(g, _):
        stage_a[:] = jnp.zeros_like(stage_a)
        stage_b[:] = jnp.zeros_like(stage_b)
        for r in range(8):  # static unroll: r is a Python int
            t = g * 8 + r

            @pl.when(t < nbands)
            def _(t=t, r=r):
                slot = lax.rem(t, 2)

                @pl.when(t + 1 < nbands)
                def _():
                    copy_in(1 - slot, t + 1, 0).start()
                    copy_in(1 - slot, t + 1, 1).start()

                copy_in(slot, t, 0).wait()
                copy_in(slot, t, 1).wait()

                x8 = xbuf[slot]                           # (CELL, fl) f32
                c8 = cbuf[slot]
                d = jnp.abs(x8 - c8.astype(jnp.float32))  # per-lane |diff|
                tau = tau_ref[0]

                @pl.when(jnp.max(d) > tau)
                def _():
                    # group-of-4 lane max, expanded per lane, as a
                    # masked-roll tree: pair max within lane pairs, then
                    # pair-of-pairs. Groups never span the array edge
                    # (fl % CP == 0), so roll wrap never leaks through.
                    odd = lax.rem(lane_iota, 2) == 1
                    p = jnp.maximum(
                        d, jnp.where(odd, jnp.roll(d, 1, axis=1),
                                     jnp.roll(d, -1, axis=1)))
                    hi = lane_r >= 2
                    gm = jnp.maximum(
                        p, jnp.where(hi, jnp.roll(p, 2, axis=1),
                                     jnp.roll(p, -2, axis=1)))
                    changed = gm > tau                    # per-lane
                    # margins only matter at tau < 0 (all-changed
                    # refresh semantics); at tau >= 0 their diff is 0
                    pr = sub_iota + t * CELL - 1
                    valid = (changed & lane_valid
                             & (pr >= 0) & (pr < fg.h))
                    # a changed pixel contributes its CP group lanes
                    npix_ref[0] += jnp.sum(valid.astype(jnp.int32))

                    drain(slot)
                    wbuf[slot] = jnp.where(changed, x8.astype(wbuf.dtype),
                                           c8)
                    copy_out(slot, t).start()
                    wrote[slot] = t + 1

                    vf = valid.astype(jnp.bfloat16)
                    ra = jnp.max(vf, axis=0, keepdims=True)    # (1, fl)
                    rb = jnp.max(vf[:2], axis=0, keepdims=True)
                    here = sub_iota == r
                    stage_a[:] = jnp.where(here, ra, stage_a[:])
                    stage_b[:] = jnp.where(here, rb, stage_b[:])

        base = pl.multiple_of(g * 8, 8)
        rowa[pl.ds(base, 8), :] = stage_a[:]
        rowb[pl.ds(base, 8), :] = stage_b[:]

    lax.fori_loop(0, ngroups, group_body, None)
    drain(0)
    drain(1)

    # cell_or[i] = rowA[i] | rowB[i+1] (flat band t holds pixel rows
    # CELL*t-1..CELL*t+6, see module doc); the sublane roll aligns
    # rowB[i+1] with row i, its wrapped last row lands above cells_h and
    # is sliced away. ONE well-shaped (8g, fl) @ (fl, cells_w) MXU dot
    # yields the dilated cell mask (0/1 values exact in bf16, counts
    # exact in the f32 accumulator).
    cell_or = jnp.maximum(rowa[:], jnp.roll(rowb[:], -1, axis=0))
    colsum = jnp.dot(cell_or, m2buf[:], preferred_element_type=jnp.float32)
    mask_ref[:] = (colsum[:cells_h] > 0).astype(jnp.float32)
    npix_ref[0] = npix_ref[0] // CP


def detect_accept_flat4_pallas(x4f: jnp.ndarray, cache4: jnp.ndarray, tau,
                               fg: Flat4Geom, *, pad_lo: int = 1,
                               win: int = CELL + 2, frame_t=None,
                               interpret: bool = False):
    """Fused detect+accept+dilate over a flat4 stem cache.

    Args:
      x4f: (fh, fl) float32 flat4 view of the UNROUNDED input
        (flat4.to_flat4(x, fg, jnp.float32)) — or, with ``frame_t``, the
        whole (T, fh, fl) clip (flat4.clip_to_flat4): the kernel DMAs
        its bands directly out of frame ``frame_t`` in HBM
        (clip-resident ingest, runner.scan_video ``ingest=True``).
      cache4: (fh, fl) accepted-value cache (aliased/donated).
      tau: scalar threshold.
      frame_t: optional scalar int32 frame index selecting x4f[frame_t].
      pad_lo/win: the 3x3/s1/SAME receptive window on the 8x8 cell grid
        (window 10 starting at cell_origin - 1).

    Returns (new_cache4, cell_mask f32 (H/8, W/8) — RF-dilated exact,
             n_changed_pixels int32 (1,)).
    """
    clip_mode = frame_t is not None
    frame_shape = x4f.shape[1:] if clip_mode else x4f.shape
    assert x4f.dtype == jnp.float32 and frame_shape == cache4.shape, \
        (x4f.dtype, x4f.shape, cache4.shape)
    assert fg.fh % CELL == 0 and fg.fl % 128 == 0, fg
    cells_h, cells_w = fg.h // CELL, fg.w // CELL
    nbands = fg.fh // CELL
    nrows = -(-nbands // 8) * 8  # row-OR accumulators padded to the
    #                              8-aligned group-flush granularity
    kern = functools.partial(_kernel, fg=fg, cells_h=cells_h,
                             cells_w=cells_w, pad_lo=pad_lo, win=win,
                             clip_mode=clip_mode)
    new_cache, mask, npix = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(cache4.shape, cache4.dtype),
            jax.ShapeDtypeStruct((cells_h, cells_w), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, CELL, fg.fl), jnp.float32),
            pltpu.VMEM((2, CELL, fg.fl), cache4.dtype),
            pltpu.VMEM((2, CELL, fg.fl), cache4.dtype),
            pltpu.VMEM((nrows, fg.fl), jnp.bfloat16),
            pltpu.VMEM((nrows, fg.fl), jnp.bfloat16),
            pltpu.VMEM((CELL, fg.fl), jnp.bfloat16),
            pltpu.VMEM((CELL, fg.fl), jnp.bfloat16),
            pltpu.VMEM((fg.fl, cells_w), jnp.bfloat16),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(x4f, cache4, jnp.asarray([tau], jnp.float32),
      jnp.asarray(frame_t if clip_mode else 0, jnp.int32).reshape(1))
    return new_cache, mask, npix
