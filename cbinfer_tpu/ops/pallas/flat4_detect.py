"""Fused full-map detect+accept+dilate on the FLAT4 stem cache (C1+C2).

The patch_stem backend's detect chain ran as XLA ops on the flat4 buffer
(flat4.detect_accept_flat4 + three changed_tile_mask reductions): measured
~262 us/frame of the 824 us 720p scene frame (r3-final trace) — a diff
reduce (53 us), the lane-repeat mask broadcast+reshape (48 us), the
to_flat4 pad (26 us), the select write, and the tile-mask reduce_windows,
each a separate full-map HBM pass. This kernel does the whole chain in ONE
banded sweep (the _band_kernel pattern, detect.py:45, on rank-2 flat4):

  * per (8, fl) flat band (all aligned DMA: fl % 128 == 0 by flat4
    construction): per-lane f32 diff vs the unrounded input, group-of-4
    lane max via SIX MASKED LANE ROTATIONS (no rank-3 reshape — Mosaic
    relayouts cost more than the rolls), per-pixel accept select written
    back through the aliased cache, and the receptive-field-exact dilated
    8x8-cell changed mask accumulated in VMEM via indicator matmuls
    (the _sparse_kernel dilation trick, here lane->cell-column).
  * the ONLY remaining XLA op is the to_flat4(x, f32) pad that shapes the
    unrounded input (detect semantics compare f32 x vs f32 cache —
    flat4.detect_accept_flat4 doc; rounding first flips borderline
    pixels).

Exactness: bit-identical accepted cache, npix, and 8x8-cell dilated mask
vs the XLA chain (asserted in tests/test_patch_stem.py); the (8,32) stem
tile mask and the HINT-grid mask both derive exactly from the 8x8-cell
map (a stem tile's input window is the union of its 4 cells' windows).

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
_BANDS_PER_BLOCK = 1


def _kernel(x4_ref, cache_in_ref, tau_ref,            # HBM, HBM, SMEM
            cache_ref, mask_ref, npix_ref,            # HBM(aliased), VMEM, SMEM
            xbuf, cbuf, wbuf, macc, m2buf, in_sems, out_sems,
            *, fg: Flat4Geom, cells_h: int, cells_w: int,
            pad_lo: int, win: int):
    del cache_in_ref  # aliased with cache_ref
    fh, fl = fg.fh, fg.fl
    nbands = fh // CELL

    def copy_in(slot, t, which):
        if which == 0:
            return pltpu.make_async_copy(
                x4_ref.at[pl.ds(t * CELL, CELL), :],
                xbuf.at[slot], in_sems.at[slot, which])
        return pltpu.make_async_copy(
            cache_ref.at[pl.ds(t * CELL, CELL), :],
            cbuf.at[slot], in_sems.at[slot, which])

    def copy_out(slot, t):
        return pltpu.make_async_copy(
            wbuf.at[slot],
            cache_ref.at[pl.ds(t * CELL, CELL), :],
            out_sems.at[slot])

    # hoisted lane -> cell-column window indicator: m2[l, j] = 1 iff the
    # pixel column of lane l (= l//CP - 1; margins < 0 or >= w never have
    # nonzero diff) lies in cell column j's input window
    # [CELL*j - pad_lo, CELL*j - pad_lo + win)
    # the (pc, pr) validity terms matter only at tau < 0 (the all-changed
    # refresh semantics): margin lanes/rows then pass the tau test with
    # diff 0 and must not count as pixels or dilate into the mask
    pc = lax.broadcasted_iota(jnp.int32, (fl, cells_w), 0) // CP - 1
    j0 = lax.broadcasted_iota(jnp.int32, (fl, cells_w), 1) * CELL - pad_lo
    m2buf[:] = ((j0 <= pc) & (pc < j0 + win)
                & (0 <= pc) & (pc < fg.w)).astype(jnp.bfloat16)

    macc[:] = jnp.zeros_like(macc)
    npix_ref[0] = 0
    copy_in(0, 0, 0).start()
    copy_in(0, 0, 1).start()

    lane_iota = lax.broadcasted_iota(jnp.int32, (CELL, fl), 1)
    lane_r = lax.rem(lane_iota, CP)
    grp = lane_iota // CP
    lane_valid = (grp >= 1) & (grp <= fg.w)

    def body(t, _):
        slot = lax.rem(t, 2)

        @pl.when(t + 1 < nbands)
        def _():
            copy_in(1 - slot, t + 1, 0).start()
            copy_in(1 - slot, t + 1, 1).start()

        copy_in(slot, t, 0).wait()
        copy_in(slot, t, 1).wait()

        x8 = xbuf[slot]                                   # (CELL, fl) f32
        c8 = cbuf[slot]
        d = jnp.abs(x8 - c8.astype(jnp.float32))          # per-lane |diff|
        # group-of-4 lane max, expanded per lane: lane l at in-group
        # offset r needs max over lanes l - r .. l - r + 3, i.e. shifted
        # copies s in [-3, 3] gated by 0 <= r + s <= 3. Groups never span
        # the array edge (fl % CP == 0), so roll wrap never leaks through
        # the gate.
        gm = d
        for s in range(-(CP - 1), CP):
            if s == 0:
                continue
            ok = (lane_r + s >= 0) & (lane_r + s < CP)
            gm = jnp.maximum(gm, jnp.where(ok, jnp.roll(d, -s, axis=1),
                                           jnp.float32(0)))
        changed = gm > tau_ref[0]                         # (CELL, fl), per-lane
        pr_band = (lax.broadcasted_iota(jnp.int32, (CELL, fl), 0)
                   + t * CELL - 1)
        row_valid = (pr_band >= 0) & (pr_band < fg.h)
        valid = changed & lane_valid & row_valid
        npix_ref[0] += jnp.sum(
            (valid & (lane_r == 0)).astype(jnp.int32))

        @pl.when(t >= 2)
        def _():
            copy_out(slot, t - 2).wait()

        wbuf[slot] = jnp.where(changed, x8.astype(wbuf.dtype), c8)
        copy_out(slot, t).start()

        # dilation: band t holds pixel rows CELL*t - 1 + r (flat row
        # offset -1); cell row i's window is [CELL*i - pad_lo, + win)
        i0 = (lax.broadcasted_iota(jnp.int32, (cells_h, CELL), 0) * CELL
              - pad_lo)
        pr = (lax.broadcasted_iota(jnp.int32, (cells_h, CELL), 1)
              + t * CELL - 1)
        m1 = ((i0 <= pr) & (pr < i0 + win)).astype(jnp.float32)
        colsum = jnp.dot(valid.astype(jnp.bfloat16), m2buf[:],
                         preferred_element_type=jnp.float32)
        contrib = jnp.dot(m1, colsum,
                          preferred_element_type=jnp.float32)
        macc[:] = jnp.maximum(macc[:], (contrib > 0).astype(jnp.float32))

    lax.fori_loop(0, nbands, body, None)

    copy_out(nbands % 2, nbands - 2).wait()
    copy_out((nbands - 1) % 2, nbands - 1).wait()
    mask_ref[:] = macc[:]


def detect_accept_flat4_pallas(x4f: jnp.ndarray, cache4: jnp.ndarray, tau,
                               fg: Flat4Geom, *, pad_lo: int = 1,
                               win: int = CELL + 2,
                               interpret: bool = False):
    """Fused detect+accept+dilate over a flat4 stem cache.

    Args:
      x4f: (fh, fl) float32 flat4 view of the UNROUNDED input
        (flat4.to_flat4(x, fg, jnp.float32)).
      cache4: (fh, fl) accepted-value cache (aliased/donated).
      tau: scalar threshold.
      pad_lo/win: the 3x3/s1/SAME receptive window on the 8x8 cell grid
        (window 10 starting at cell_origin - 1).

    Returns (new_cache4, cell_mask f32 (H/8, W/8) — RF-dilated exact,
             n_changed_pixels int32 (1,)).
    """
    assert x4f.dtype == jnp.float32 and x4f.shape == cache4.shape, \
        (x4f.dtype, x4f.shape, cache4.shape)
    assert fg.fh % CELL == 0 and fg.fl % 128 == 0, fg
    cells_h, cells_w = fg.h // CELL, fg.w // CELL
    kern = functools.partial(_kernel, fg=fg, cells_h=cells_h,
                             cells_w=cells_w, pad_lo=pad_lo, win=win)
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
            jax.ShapeDtypeStruct(cache4.shape, cache4.dtype),
            jax.ShapeDtypeStruct((cells_h, cells_w), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, CELL, fg.fl), jnp.float32),
            pltpu.VMEM((2, CELL, fg.fl), cache4.dtype),
            pltpu.VMEM((2, CELL, fg.fl), cache4.dtype),
            pltpu.VMEM((cells_h, cells_w), jnp.float32),
            pltpu.VMEM((fg.fl, cells_w), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(x4f, cache4, jnp.asarray([tau], jnp.float32))
    return new_cache, mask, npix
