"""Stages C1+C2: change detection, cache update, output-tile mask.

Reference semantics (arXiv 1704.04313 §3.1 / 1808.05488 §IV-B; CUDA kernel,
one thread per pixel — SURVEY.md C1): pixel p changed iff
``max_c |x[p,c] - in_cache[p,c]| > tau``; the input cache is updated ONLY at
changed pixels, so the comparison baseline is the last ACCEPTED value.
This per-pixel rule is kept EXACTLY (it is pure elementwise work); only the
recompute granularity downstream is tiled.

C2 (mask propagation): an output TILE must be recomputed iff any input pixel
in its receptive field changed. Computed as a windowed OR over the per-pixel
change map with window = the tile's gathered input region and stride = tile
stride — i.e. the exact minimal changed-tile set for the per-pixel map.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .geometry import TileGeometry

# in_cache init value: guarantees frame-0 "everything changed" (SURVEY.md §3.2
# cold start) without a separate dense branch. Finite so bf16/fp32 arithmetic
# stays NaN-free.
COLD_START_FILL = 3.0e38  # near fp32 max; bf16 also represents ~3.4e38


def detect_and_update(x: jnp.ndarray, in_cache: jnp.ndarray, tau: float
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel change detection + accepted-value cache update.

    Args:
      x: (H, W, C) current input feature map.
      in_cache: (H, W, C) last accepted input (cache dtype).
      tau: change threshold (compared in fp32).

    Returns:
      (new_in_cache, changed): changed is (H, W) bool.
    """
    diff = jnp.max(jnp.abs(x.astype(jnp.float32)
                           - in_cache.astype(jnp.float32)), axis=-1)
    changed = diff > jnp.float32(tau)
    new_cache = jnp.where(changed[..., None], x.astype(in_cache.dtype), in_cache)
    return new_cache, changed


def detect_and_update_flat(x: jnp.ndarray, in_cache: jnp.ndarray, tau,
                           C: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """detect_and_update on the FLAT (H, W*C) view of an HWC buffer.

    The flat view is the SAME memory as (H, W, C) row-major — reshaping
    is free in both directions, so this form needs NO transpose (the
    planar form's per-frame HWC->(C,H,W) transpose measured ~0.56 ms at
    720p, xprof r3). Every op runs on rank-2 arrays whose lane dim W*C is
    a 128-multiple at real resolutions: elementwise |x - cache|, a
    (1, C)-window reduce_window for the per-pixel channel max, and a
    lane-repeat expand for the write-back — layouts XLA handles at
    roofline, unlike the rank-3 C=3 forms.

    Args: x, in_cache: (H, W*C) flat views; C: channels per pixel.

    Returns (new_cache (H, W*C), changed (H, W) bool)."""
    diff = jnp.abs(x.astype(jnp.float32) - in_cache.astype(jnp.float32))
    pixdiff = lax.reduce_window(
        diff, -jnp.inf, lax.max, window_dimensions=(1, C),
        window_strides=(1, C), padding="VALID")          # (H, W)
    changed = pixdiff > jnp.float32(tau)
    expand = jnp.repeat(changed, C, axis=1)              # (H, W*C)
    new = jnp.where(expand, x.astype(in_cache.dtype), in_cache)
    return new, changed


def changed_tile_mask(changed: jnp.ndarray, g: TileGeometry) -> jnp.ndarray:
    """Per-pixel change map -> (tiles_h, tiles_w) bool output-tile mask.

    Windowed OR with window (win_h, win_w), stride (th*sh, tw*sw) and the
    layer's input padding, so window t starts at ``t*th*sh - pad_lo`` —
    exactly the input region gathered for output tile t.
    """
    sh, sw = g.stride
    # exact high padding for the TRUE window extent (g.pad_hi_* may be larger
    # for DMA alignment); negative values legally shrink the window count.
    phi_h = (g.tiles_h - 1) * g.th * sh + g.win_h - g.in_h - g.pad_lo_h
    phi_w = (g.tiles_w - 1) * g.tw * sw + g.win_w - g.in_w - g.pad_lo_w
    out = lax.reduce_window(
        changed,
        init_value=False,
        computation=jnp.logical_or,
        window_dimensions=(g.win_h, g.win_w),
        window_strides=(g.th * sh, g.tw * sw),
        padding=((g.pad_lo_h, phi_h), (g.pad_lo_w, phi_w)),
    )
    assert out.shape == (g.tiles_h, g.tiles_w), (out.shape, g)
    return out
