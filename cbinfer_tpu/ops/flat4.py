"""Lane-aligned FLAT4 input-cache layout for small-cin stems (C1+C8).

The cin=3 stem was the one layer Pallas could not serve on this hardware:
Mosaic lane-pads rank-3 small-lane buffers ~42x in both memory spaces and
rejects DMA-slicing them (probed r2), and every per-frame repacking of the
input into a kernel-friendly form cost more than the dense conv it would
replace (scripts/probe_patch_stem.py, RESULTS.md negative results). The
FLAT4 layout dissolves the wall at the STORAGE level instead: the accepted
stem input lives as a rank-2 bf16 buffer

    flat4[1 + y, CP*(x+1) + c] = input[y, x, c]      CP = 4 lanes per pixel

with one zero pixel of left/top spatial margin (the 3x3 SAME conv's
zero padding, stored once, never re-written) and the c = cin..3 lane slots
zero. Consequences, all load-bearing:

  * Every (8-row, 32-pixel) tile window is a (16, 256) slice at an
    8-aligned sublane offset and a 128-aligned lane offset — exactly the
    slice family Mosaic DMAs at full speed (probe_dma_constraints.py).
  * 32 px x 4 lanes = one 128-lane vector register row: no lane padding
    waste anywhere (vs 42x for rank-3 cin=3).
  * The pixel-change map is a (1, CP)-window lane reduction, the accept
    write-back a lane-repeat select — rank-2 XLA ops at roofline
    (same argument as detect.detect_and_update_flat).

The Pallas stem kernel (ops/pallas/patch_stem.py) assembles im2col
patches from these windows in VMEM with exact 0/1 selection matmuls.

Reference semantics preserved exactly (arXiv 1704.04313 §3.1): per-PIXEL
accept at max_c |x - cache| > tau; only the storage layout is TPU-shaped.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax import lax

CP = 4        # stored lanes (channels) per pixel
TILE_H = 8    # stem tile rows
TILE_W = 32   # stem tile width in pixels (32 px * CP = 128 lanes)
WIN_R = 16    # DMA window rows per tile (8 rows + halo, 8-aligned)
WIN_L = 256   # DMA window lanes per tile (2 aligned lane tiles)


@dataclass(frozen=True)
class Flat4Geom:
    h: int
    w: int
    cin: int
    tiles_h: int
    tiles_w: int
    fh: int  # flat rows: 1 top margin + h + 7 bottom margin
    fl: int  # flat lanes: CP*(w + 2) rounded up to 128


def supports(in_shape: Tuple[int, int, int], kernel, stride, dilation,
             padding, activation) -> bool:
    """Static gate for the patch_stem backend (layers.py / convert.py)."""
    h, w, c = in_shape
    return (tuple(kernel) == (3, 3) and tuple(stride) == (1, 1)
            and tuple(dilation) == (1, 1) and padding == "SAME"
            and 1 <= c <= 3 and h % TILE_H == 0 and w % TILE_W == 0
            and activation in (None, "relu"))


def flat4_geom(h: int, w: int, cin: int) -> Flat4Geom:
    assert h % TILE_H == 0 and w % TILE_W == 0 and 1 <= cin <= 3, \
        (h, w, cin)
    return Flat4Geom(h=h, w=w, cin=cin, tiles_h=h // TILE_H,
                     tiles_w=w // TILE_W, fh=h + 8, fl=CP * w + 128)


def to_flat4(x: jnp.ndarray, fg: Flat4Geom, dtype) -> jnp.ndarray:
    """(H, W, cin) -> (fh, fl) flat4 buffer (margins and c>=cin zero).

    Form chosen by the r4 on-chip probe (scripts/probe_flat4_ingest.py,
    barrier harness): concat the zero lane(s) -> cast -> rank-2 reshape
    -> rank-2 pad measured 42 us/frame vs 92 for the original
    rank-3-pad-then-reshape (whose post-pad (fh, w', CP) -> (fh, fl)
    minor-dim merge lowers to a real relayout copy) and 63 for
    pad-channels-first. Element placement is identical: pixel p of row r
    lands at lanes [CP*(1+p), CP*(2+p)) of flat row r+1 either way."""
    f = jnp.concatenate(
        [x, jnp.zeros((*x.shape[:2], CP - fg.cin), x.dtype)], axis=-1
    ) if fg.cin < CP else x
    f = f.astype(dtype).reshape(fg.h, CP * fg.w)
    return jnp.pad(f, ((1, fg.fh - fg.h - 1),
                       (CP, fg.fl - CP * fg.w - CP)))


def interior_flat2(x: jnp.ndarray, fg: Flat4Geom, dtype) -> jnp.ndarray:
    """(H, W, cin) -> the (h, CP*w) INTERIOR of the flat4 layout (no
    margins): concat zero lane(s) -> cast -> rank-2 reshape. The producer
    half of update_flat4."""
    f = jnp.concatenate(
        [x, jnp.zeros((*x.shape[:2], CP - fg.cin), x.dtype)], axis=-1
    ) if fg.cin < CP else x
    return f.astype(dtype).reshape(fg.h, CP * fg.w)


def update_flat4(buf: jnp.ndarray, x: jnp.ndarray, fg: Flat4Geom
                 ) -> jnp.ndarray:
    """Write frame ``x`` into a persistent flat4 staging buffer.

    ``buf`` is a (fh, fl) buffer whose margins are ALREADY zero (they are
    constant — cb_layer_init writes them once); only the (h, CP*w)
    interior is dynamic_update_slice'd, which XLA performs in place when
    the buffer rides a donated scan carry. One read of x + one interior
    write = the ingest bandwidth floor; the to_flat4 pad-chain form pays
    a second full-buffer pass re-writing margins every frame
    (probe_flat4_ingest v0 vs v4)."""
    from jax import lax
    return lax.dynamic_update_slice(
        buf, interior_flat2(x, fg, buf.dtype), (1, CP))


def from_flat4(f4: jnp.ndarray, fg: Flat4Geom) -> jnp.ndarray:
    """flat4 -> (H, W, cin) interior view (free reshape + slice)."""
    v = f4.reshape(fg.fh, fg.fl // CP, CP)
    return v[1:1 + fg.h, 1:1 + fg.w, :fg.cin]


@struct.dataclass
class Flat4Clip:
    """A whole clip pre-shaped to flat4 plus the current frame index.

    The CLIP-RESIDENT ingest form (runner.scan_video ``ingest=True``): the
    chunk is converted to (T, fh, fl) float32 ONCE in a vectorized XLA
    pass outside the scan, and the scan body hands the stem this wrapper
    instead of an (H, W, C) frame. The fused detect kernel then DMAs its
    bands straight out of ``clip[t]`` in HBM — no per-frame dynamic_slice
    materialization, no per-frame to_flat4 pad/reshape (xprof r3: that
    chain cost ~90 us of the 658 us 720p scene frame). Non-fused
    consumers (jnp backend, the refresh path's dense conv) materialize
    the HWC frame via ``frame_hwc`` — identical f32 values, so detect
    semantics are bit-identical to the per-frame path.
    """
    clip: jnp.ndarray          # (T, fh, fl) float32
    t: jnp.ndarray             # scalar int32 index into the clip
    h: int = struct.field(pytree_node=False)
    w: int = struct.field(pytree_node=False)
    cin: int = struct.field(pytree_node=False)

    @property
    def geom(self) -> Flat4Geom:
        return flat4_geom(self.h, self.w, self.cin)

    def frame_flat4(self) -> jnp.ndarray:
        """(fh, fl) f32 view of frame t (one dynamic slice)."""
        return lax.dynamic_index_in_dim(self.clip, self.t, 0,
                                        keepdims=False)

    def frame_hwc(self) -> jnp.ndarray:
        """(H, W, cin) f32 frame t — the classic per-frame form."""
        return from_flat4(self.frame_flat4(), self.geom)


def clip_to_flat4(frames: jnp.ndarray, fg: Flat4Geom) -> jnp.ndarray:
    """(T, H, W, cin) -> (T, fh, fl) float32, one vectorized pass."""
    return jax.vmap(lambda x: to_flat4(x, fg, jnp.float32))(frames)


def detect_accept_flat4(x: jnp.ndarray, cache4: jnp.ndarray, tau,
                        fg: Flat4Geom):
    """Per-pixel detect + accepted-value update of a flat4 cache.

    The tau comparison runs on the UNROUNDED (H, W, cin) input against the
    cache's interior view in f32 — the exact detect_and_update semantics
    every other backend uses (comparing the cache-dtype-rounded input
    instead flips borderline pixels: measured 0.8% of 720p bf16 logits
    moved when the stem did that). Margins and zero lane slots are equal
    in both flat4 buffers by construction, so the select leaves them zero.

    Returns (new_cache4, changed (H, W) bool, n_changed_pixels int32).
    """
    old = from_flat4(cache4, fg)
    diff = jnp.max(jnp.abs(x.astype(jnp.float32) - old.astype(jnp.float32)),
                   axis=-1)                              # (H, W)
    changed = diff > jnp.float32(tau)
    pad_w = fg.fl // CP - fg.w - 1
    changed_full = jnp.pad(changed, ((1, fg.fh - fg.h - 1), (1, pad_w)))
    expand = jnp.repeat(changed_full, CP, axis=1)        # (fh, fl)
    new4 = to_flat4(x, fg, cache4.dtype)
    new_cache = jnp.where(expand, new4, cache4)
    n_pix = jnp.sum(changed, dtype=jnp.int32)
    return new_cache, changed, n_pix
