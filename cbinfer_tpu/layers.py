"""Change-based layers: CBConv2d / CBMaxPool2d as pure functions + state
(SURVEY.md C8, C9).

The reference exposes these as stateful PyTorch ``nn.Module`` drop-ins holding
per-layer input/output caches as GPU buffers ([repo-recall]; /root/reference
is empty this session). TPU-native shape: parameters and caches are explicit
pytrees threaded through pure ``apply`` functions so the whole per-frame
network is one jitted XLA program and video streaming is a ``lax.scan`` with
a donated carry (SURVEY.md §3.2).

Cold start needs no special branch: ``in_cache`` is initialized to
``COLD_START_FILL`` so frame 0 detects every pixel as changed and recomputes
everything (dense-equivalent work), exactly the reference's frame-0 behavior.

Capacity overflow: if more than ``capacity`` tiles changed, the layer takes a
full dense recompute branch (lax.cond). By the out_cache == f(in_cache)
invariant (golden.py doc) this is VALUE-EXACT, not an approximation — it
only spends more compute.

Change-mask modes (SURVEY.md §1): the DEFAULT per-layer semantics is
RE-DETECTION — each layer compares its own input against its own cache
with its own tau, resetting the mask at every layer so recompute regions
do not grow with depth (arXiv 1808.05488 §IV-B, the reference behavior).
The CB17-style MASK-FORWARDING mode (an output pixel recomputes whenever
the producer recomputed anything in its receptive field, no tau reset)
needs no separate code path: set that layer's tau to -1 — every pixel the
producer's dilated mask (the dirty hint) visits is then accepted and
marked changed, which IS the forwarded mask. tests/test_streaming.py
::test_tau_minus_one_is_mask_forwarding pins this equivalence.

Dirty-hint chaining (TPU-native refinement, no reference equivalent): a pixel
whose diff exceeded tau last frame was ACCEPTED then (diff now 0), and a
pixel the producer layer did not recompute is bit-identical to last frame —
so only pixels inside the producer's recomputed tiles can be changed now.
Each layer therefore emits a conservative tile mask over its output (the
"dirty hint", on a fixed HINT_TILE grid), and the next layer's Pallas
detection kernel reads/updates ONLY hinted tiles, making detection cost
proportional to the change rate instead of the frame area. Layers with no
hint (layer 0, after dense/upsample layers) fall back to full-map detection.
The jnp backend computes hints but detects full-map (XLA cannot skip reads
data-dependently); values are identical either way.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple  # noqa: F401

import jax
import jax.numpy as jnp
from flax import struct
from jax import lax

from .config import ConvSpec, PipelineConfig, PoolSpec
from .ops import compact, detect
from .ops import flat4 as flat4_ops
from .ops.delta_conv import (delta_conv_jnp, dense_conv_shifted,
                             make_storage, storage_interior)
from .ops.delta_pool import delta_pool_jnp, dense_pool
from .ops.geometry import TileGeometry, cdiv, conv_tile_geometry

NEG_FILL = -3.0e38  # SAME-padding fill for max pooling (finite "-inf")
HINT_TILE = 8       # fixed tile size of inter-layer dirty hints

# Trace-time gate: patch_stem per-frame flat4 ingest via carry-scratch
# dynamic_update_slice (CBLayerState.scratch doc). Flipped on a measured
# on-chip win only (probe_flat4_ingest v4 vs v0).
INGEST_DUS = False


@struct.dataclass
class CBLayerState:
    in_cache: jnp.ndarray   # (H, W, Cin)  last accepted input
    out_cache: jnp.ndarray  # (Ho_pad, Wo_pad, Cout) cached output
    # Optional per-layer scratch carried across frames. Used by the
    # patch_stem ingest (INGEST_DUS): the frame's f32 flat4 staging
    # buffer whose margins are constant zeros — carrying it lets each
    # frame write ONLY the (h, 4w) interior via dynamic_update_slice
    # (one fused pass) instead of re-padding the whole (fh, fl) buffer
    # (the r4 form's second memory pass, ~48 vs ~33 us at 720p).
    scratch: Optional[jnp.ndarray] = None


class PreDetect(NamedTuple):
    """The consumer layer's detect outputs, computed by the PRODUCER's
    fused delta-conv+detect kernel (ops/pallas/delta_conv_detect.py): the
    consumer skips C1+C2 entirely and goes straight to compaction.
    Bit-identical to running detect_sparse on the producer's output
    (tests/test_delta_conv_detect.py, test_streaming fusion parity)."""
    in_cache: jnp.ndarray   # consumer's accepted-value cache, updated
    mask: jnp.ndarray       # (tiles_h, tiles_w) f32 changed-out-tile mask
    npix: jnp.ndarray       # (1,) int32 changed pixels
    n_detect: jnp.ndarray   # () int32 tiles visited (== producer count)


class FuseCtx(NamedTuple):
    """Consumer-layer context handed to a ``fuse_next_detect`` producer by
    CBNet.apply: the consumer's spec, its accepted-value cache (consumed by
    the fused kernel via aliasing) and its runtime tau."""
    spec: Any
    in_cache: jnp.ndarray
    tau: Any


class DirtyHint(NamedTuple):
    """Conservative changed-region mask over a tensor, HINT_TILE granularity.

    ``predetect`` is attached by a producer whose kernel already ran the
    NEXT layer's detect (fused path); only the immediate consumer reads it.
    """
    mask: jnp.ndarray  # (ceil(H/8), ceil(W/8)) bool
    predetect: Optional[PreDetect] = None


@struct.dataclass
class Feature:
    """A layer output in its PADDED storage form plus logical dims.

    CB layers consume Features directly (their detect kernel reads logical
    coordinates out of the padded array), so the crop slice between CB
    layers is never materialized — XLA dead-code-eliminates it. Non-CB
    consumers call .crop(). Logical dims are static pytree aux data.
    """
    data: jnp.ndarray  # (h_pad, w_pad, c_pad)
    h: int = struct.field(pytree_node=False)
    w: int = struct.field(pytree_node=False)
    c: int = struct.field(pytree_node=False)

    def crop(self) -> jnp.ndarray:
        return self.data[:self.h, :self.w, :self.c]


def _unwrap(x):
    if isinstance(x, Feature):
        return x.data, x.h, x.w, x.c
    if isinstance(x, flat4_ops.Flat4Clip):
        # clip-resident ingest form (flat4.Flat4Clip): consumers that
        # need the HWC frame materialize it here (one dynamic slice +
        # free reshape; the fused patch_stem detect path never calls
        # this — it hands the whole clip to the kernel)
        return x.frame_hwc(), x.h, x.w, x.cin
    return x, x.shape[0], x.shape[1], x.shape[2]


def _geometry(spec, in_shape: Tuple[int, int, int], cfg: PipelineConfig
              ) -> TileGeometry:
    if isinstance(spec, ConvSpec):
        th, tw = cfg.tile.tile_h, cfg.tile.tile_w
        if cfg.backend == "band_cached":
            # full-width row bands: ONE tile per row of tiles (tw clamps
            # to out_w inside conv_tile_geometry) — contiguous gathers and
            # scatters, no per-8x8-tile slicing (cb_conv_apply band branch)
            tw = 1 << 30
        elif cfg.backend == "patch_stem":
            # fixed (8, 32)-px tiles: 32 px x 4 stored lanes = one 128-lane
            # row of the flat4 cache (ops/flat4.py layout invariants)
            th, tw = flat4_ops.TILE_H, flat4_ops.TILE_W
        return conv_tile_geometry(in_shape, spec.kernel, spec.stride,
                                  spec.dilation, spec.padding, th, tw)
    return conv_tile_geometry(in_shape, spec.window, spec.stride, (1, 1),
                              spec.padding, cfg.tile.tile_h, cfg.tile.tile_w)


LANE = 128  # TPU lane width


def lane_pad(c: int, cfg: PipelineConfig) -> int:
    """Channel storage width. Pallas backend: Mosaic cannot slice VMEM
    buffers whose minor (lane) dim is not a multiple of 128, so all CB
    caches/weights are stored 128-lane padded (pad lanes carry zeros and can
    never trigger detection — both caches agree there by construction).
    jnp backend stores logical widths.

    Small-cin stems (3 channels) CANNOT opt out of the padding on this
    hardware generation: probed r2, Mosaic physically lane-pads rank-3
    small-lane buffers in BOTH memory spaces (a (720,1280,3) VMEM scratch
    is 42x its logical bytes and blows the ~16MB budget) and rejects
    DMA-slicing of small-lane HBM memrefs entirely (even H-only slices),
    so there is no layout in which a banded/per-tile small-cin delta-conv
    kernel can reach its data — that is why cin=3 stems run as
    ``dense_cached`` (XLA detect + XLA conv from the accepted cache, full
    hint chain) rather than through a Pallas delta kernel."""
    if cfg.backend == "pallas":
        return -(-c // LANE) * LANE
    return c


def pad_lanes(x: jnp.ndarray, c_pad: int) -> jnp.ndarray:
    if x.shape[-1] == c_pad:
        return x
    return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, c_pad - x.shape[-1]),))


def cb_layer_init(spec, in_shape: Tuple[int, int, int], cfg: PipelineConfig
                  ) -> CBLayerState:
    """Allocate per-layer caches (HBM-resident across frames)."""
    pipe_cfg = cfg  # the PIPELINE config (before the per-layer override)
    cfg = _layer_cfg(spec, cfg)
    dtype = jnp.dtype(cfg.cache_dtype)
    cout = spec.features if isinstance(spec, ConvSpec) else in_shape[2]
    if (cfg.backend in ("dense_cached", "band_cached")
            and isinstance(spec, ConvSpec)):
        # dense_cached/band_cached stems on a pallas PIPELINE write their
        # out cache LANE-padded (via padded weights, cb_conv_apply) so the
        # consumer's pad_lanes is a no-op — the per-frame pad of an
        # unpadded 64-ch stem output measured 0.70 ms at 720p (xprof r3)
        H, W, C = in_shape
        g = _geometry(spec, in_shape, cfg)
        return CBLayerState(
            in_cache=make_storage(g, detect.COLD_START_FILL, 0.0, dtype),
            out_cache=jnp.zeros((g.out_h_pad, g.out_w_pad,
                                 lane_pad(cout, pipe_cfg)), dtype=dtype),
        )
    if cfg.backend == "patch_stem" and isinstance(spec, ConvSpec):
        # lane-aligned flat4 stem cache (ops/flat4.py): interior cold-start
        # fill, spatial margins and c>=cin lane slots CONSTANT zero (they
        # are the conv's SAME padding, written once here, never again).
        # The out cache is LANE-padded like the other stem backends.
        H, W, C = in_shape
        fg = flat4_ops.flat4_geom(H, W, C)
        g = _geometry(spec, in_shape, cfg)
        cold = jnp.full((H, W, C), detect.COLD_START_FILL, dtype)
        return CBLayerState(
            in_cache=flat4_ops.to_flat4(cold, fg, dtype),
            out_cache=jnp.zeros((g.out_h_pad, g.out_w_pad,
                                 lane_pad(cout, pipe_cfg)), dtype=dtype),
            scratch=(jnp.zeros((fg.fh, fg.fl), jnp.float32)
                     if INGEST_DUS else None),
        )
    if cfg.backend == "dense_cached_flat":
        # FLAT (H, W*C) stem cache — same memory as HWC, clean rank-2
        # layouts for detect (detect.detect_and_update_flat doc). No
        # spatial margins (the conv pads on read); the OUT cache is
        # LANE-padded so the consumer\'s pad_lanes is a no-op (the stem
        # conv writes padded channels directly via padded weights).
        H, W, C = in_shape
        g = _geometry(spec, in_shape, cfg)
        return CBLayerState(
            in_cache=jnp.full((H, W * C), detect.COLD_START_FILL, dtype),
            # lane width gated on the PIPELINE backend (dense_cached
            # parity above): a flat stem in a pure-jnp pipeline keeps
            # logical channels — padding there wastes memory and makes
            # the jnp consumer crop pad lanes every frame
            out_cache=jnp.zeros((g.out_h_pad, g.out_w_pad,
                                 lane_pad(cout, pipe_cfg)), dtype=dtype),
        )
    cin_pad = lane_pad(in_shape[2], cfg)
    cout_pad = lane_pad(cout, cfg)
    padded_in = (in_shape[0], in_shape[1], cin_pad)
    g = _geometry(spec, padded_in, cfg)
    if isinstance(spec, PoolSpec) and spec.elide_in_cache:
        # fused forward-hint pool, gate statically proven by the flagship
        # converter: the input cache is never read — a (1,1,1) placeholder
        # instead of ~hundreds of MB of dead donated-carry HBM at 720p
        return CBLayerState(
            in_cache=jnp.zeros((1, 1, 1), dtype=dtype),
            out_cache=jnp.zeros((g.out_h_pad, g.out_w_pad, cout_pad),
                                dtype=dtype),
        )
    margin = NEG_FILL if isinstance(spec, PoolSpec) else 0.0
    return CBLayerState(
        in_cache=make_storage(g, detect.COLD_START_FILL, margin, dtype),
        out_cache=jnp.zeros((g.out_h_pad, g.out_w_pad, cout_pad),
                            dtype=dtype),
    )


# ----------------------------- dirty hints ----------------------------------


def _out_hint(tile_mask: jnp.ndarray, overflow, g: TileGeometry) -> DirtyHint:
    """Map this layer's changed-output-tile mask onto the fixed hint grid of
    the CROPPED output. Overflow => dense fallback recomputed everything."""
    hh, hw = cdiv(g.out_h, HINT_TILE), cdiv(g.out_w, HINT_TILE)
    if g.th % HINT_TILE == 0 and g.tw % HINT_TILE == 0:
        m = jnp.repeat(jnp.repeat(tile_mask, g.th // HINT_TILE, 0),
                       g.tw // HINT_TILE, 1)[:hh, :hw]
    else:
        # general path: via pixel space (small bool map)
        pix = jnp.repeat(jnp.repeat(tile_mask, g.th, 0), g.tw, 1)
        pix = pix[:g.out_h, :g.out_w]
        m = lax.reduce_window(
            pix, False, jnp.logical_or,
            window_dimensions=(HINT_TILE, HINT_TILE),
            window_strides=(HINT_TILE, HINT_TILE),
            padding=((0, hh * HINT_TILE - g.out_h),
                     (0, hw * HINT_TILE - g.out_w)))
    return DirtyHint(mask=jnp.logical_or(m, overflow))


def _forward_mask(hint_mask: jnp.ndarray, g: TileGeometry) -> jnp.ndarray:
    """Changed-OUT-tile mask of a FORWARDING layer: the producer's hint
    dilated by this layer's receptive field — exact rectangle-interval
    overlap on the tile grids (out tile (a, b) reads input rows
    [a*th*sh - pad_lo_h, +win_h); hinted tile hi covers [hi*8, hi*8+8)),
    computed as two tiny indicator matmuls. Equals the tau = -1
    re-detection mask on 8-aligned maps (every pixel of a hinted tile is
    'changed' at tau = -1)."""
    hh, hw = hint_mask.shape
    sh, sw = g.stride
    lo_h = jnp.arange(g.tiles_h) * (g.th * sh) - g.pad_lo_h
    hi = jnp.arange(hh) * HINT_TILE
    m1 = ((hi[None, :] < lo_h[:, None] + g.win_h)
          & (hi[None, :] + HINT_TILE > lo_h[:, None])).astype(jnp.float32)
    lo_w = jnp.arange(g.tiles_w) * (g.tw * sw) - g.pad_lo_w
    hj = jnp.arange(hw) * HINT_TILE
    m2 = ((hj[:, None] < lo_w[None, :] + g.win_w)
          & (hj[:, None] + HINT_TILE > lo_w[None, :])).astype(jnp.float32)
    return jnp.dot(jnp.dot(m1, hint_mask.astype(jnp.float32)), m2) > 0


def _accept_hinted(x: jnp.ndarray, in_cache: jnp.ndarray,
                   hint: DirtyHint, g: TileGeometry, cfg: PipelineConfig):
    """Forwarding-mode cache update: storage tracks the producer's output
    over the hinted tiles (no diff, no tau). Returns (new_storage,
    n_detect_tiles). Pallas: sparse tile-copy kernel (ops/pallas/accept);
    jnp: full-map where (XLA cannot skip reads data-dependently) —
    value-identical either way (accept.py induction invariant)."""
    H, W = g.in_h, g.in_w
    if (cfg.backend == "pallas" and x.shape[-1] % 128 == 0
            and H >= HINT_TILE and W % HINT_TILE == 0):
        from .ops.pallas.accept import accept_tiles
        dcomp = compact.compact_mask(hint.mask, hint.mask.size)
        storage = accept_tiles(x, in_cache, dcomp.idx, dcomp.count, g,
                               interpret=cfg.interpret)
        return storage, dcomp.count
    pix = jnp.repeat(jnp.repeat(hint.mask, HINT_TILE, 0),
                     HINT_TILE, 1)[:H, :W]
    interior = storage_interior(in_cache, g)
    xi = x[:H, :W] if x.shape[:2] != (H, W) else x
    new_interior = jnp.where(pix[..., None], xi.astype(interior.dtype),
                             interior)
    # fresh constant-margin pad, NOT storage_update_interior: a
    # full-interior dynamic-update-slice into the donated scan carry is
    # the measured DUS-in-carry pathology (_detect_and_mask note);
    # margins are constant zeros by make_storage's contract
    new_storage = jnp.pad(
        new_interior, ((g.store_lo_h, g.store_hi_h),
                       (g.store_lo_w, g.store_hi_w), (0, 0))
    ).astype(in_cache.dtype)
    return new_storage, jnp.sum(hint.mask, dtype=jnp.int32)


# ------------------------------ detection -----------------------------------


def _detect_and_mask(x: jnp.ndarray, in_cache: jnp.ndarray, tau,
                     g: TileGeometry, cfg: PipelineConfig,
                     hint: Optional[DirtyHint], margin_fill=0.0):
    """C1+C2: returns (new_in_cache, changed_out_tile_mask bool,
    changed_pixels, detect_tiles).

    Pallas backend with a hint: one fused kernel reads/updates only hinted
    tiles and emits the dilated out-tile mask directly (ops/pallas/detect.py)
    — its mask may be a slight conservative superset of the exact one
    (row x col projection within 8x8 hint tiles), which preserves
    value-exactness. All other paths: full-map XLA detect + reduce_window.
    """
    if hint is not None and hint.predetect is not None:
        # the producer's fused kernel already ran THIS layer's detect on
        # tiles it had in VMEM (PreDetect doc) — bit-identical to the
        # detect_sparse path below on the same visit set
        pd = hint.predetect
        assert pd.in_cache.shape == in_cache.shape, \
            (pd.in_cache.shape, in_cache.shape)
        return pd.in_cache, pd.mask > 0.5, pd.npix[0], pd.n_detect
    # x may be a PADDED array wider than the logical dims (zero-copy
    # handoff); logical extents come from the geometry.
    H, W = g.in_h, g.in_w
    lane_ok = x.shape[-1] % 128 == 0  # Mosaic detect kernels need full lanes
    if (cfg.backend == "pallas" and hint is not None and lane_ok
            and H >= HINT_TILE and W % HINT_TILE == 0):
        from .ops.pallas.detect import detect_sparse
        dcomp = compact.compact_mask(hint.mask, hint.mask.size)
        new_storage, maskf, npix = detect_sparse(
            x, in_cache, tau, dcomp.idx, dcomp.count, g,
            interpret=cfg.interpret)
        return new_storage, maskf > 0.5, npix[0], dcomp.count
    if (cfg.backend == "pallas" and hint is None and lane_ok
            and H % HINT_TILE == 0 and W % HINT_TILE == 0):
        # hint-less layer (e.g. after a plain-dense stem): fused full-map
        # banded detect instead of 3-4 XLA passes
        from .ops.pallas.detect import detect_full_pallas
        n_detect = jnp.asarray((H // HINT_TILE) * (W // HINT_TILE), jnp.int32)
        new_storage, maskf, npix = detect_full_pallas(
            x, in_cache, tau, g, interpret=cfg.interpret)
        return new_storage, maskf > 0.5, npix[0], n_detect
    new_storage, changed, n_pix, n_detect = _detect_xla(
        x, in_cache, tau, g, hint, margin_fill)
    mask = detect.changed_tile_mask(changed, g)
    return new_storage, mask, n_pix, n_detect


def _detect_xla(x: jnp.ndarray, in_cache: jnp.ndarray, tau,
                g: TileGeometry, hint: Optional[DirtyHint],
                margin_fill=0.0):
    """XLA full-map detect + accepted-cache update; returns the PER-PIXEL
    changed map (callers derive tile masks at whatever granularity they
    need — _detect_and_mask at the compute grid, the band_cached stem at
    both the band grid and the fine hint grid)."""
    H, W = g.in_h, g.in_w
    # detect against the storage interior, write back the interior
    if x.shape[:2] != (H, W):
        x = x[:H, :W]
    interior = storage_interior(in_cache, g)
    new_interior, changed = detect.detect_and_update(x, interior, tau)
    if hint is not None:
        # even in XLA, clip detection to the hint (helps tests catch a
        # non-conservative hint: values must not depend on this)
        pix_hint = jnp.repeat(jnp.repeat(hint.mask, HINT_TILE, 0),
                              HINT_TILE, 1)[:H, :W]
        changed = jnp.logical_and(changed, pix_hint)
        new_interior = jnp.where(changed[..., None],
                                 x.astype(interior.dtype), interior)
    # fresh constant-margin pad, NOT storage_update_interior: a
    # full-interior dynamic-update-slice into the donated scan carry
    # measured 134 us/frame for the 5.6 MB stem cache (xprof r3) vs
    # memory-speed for the pad — same DUS-in-carry pathology the refresh
    # path documents (margins are CONSTANT by make_storage's contract)
    new_storage = jnp.pad(
        new_interior, ((g.store_lo_h, g.store_hi_h),
                       (g.store_lo_w, g.store_hi_w), (0, 0)),
        constant_values=margin_fill).astype(in_cache.dtype)
    n_detect = (jnp.sum(hint.mask, dtype=jnp.int32) if hint is not None
                else jnp.asarray(cdiv(H, HINT_TILE) * cdiv(W, HINT_TILE),
                                 jnp.int32))
    return new_storage, changed, jnp.sum(changed, dtype=jnp.int32), n_detect


# ------------------------------ layer steps ---------------------------------


def _run_gated(spec, state: CBLayerState, x: jnp.ndarray, g: TileGeometry,
               cfg: PipelineConfig, tile_fn, dense_fn, tau=None,
               hint: Optional[DirtyHint] = None, forward: bool = False,
               fused_fn=None
               ) -> Tuple[jnp.ndarray, CBLayerState, Dict[str, Any], DirtyHint]:
    """Shared C1->C3 + overflow-cond skeleton for conv and pool layers.

    ``tau`` may be a traced scalar (threshold tuning sweeps thresholds as
    runtime values — one compile serves the whole sweep); defaults to the
    spec's static threshold.

    ``forward=True`` (requires a hint): CB17 mask-forwarding — detection
    is replaced by the hint-dilated mask (_forward_mask) + a pure tile
    copy (_accept_hinted); tau is unused. Bit-identical to tau = -1
    re-detection on 8-aligned maps (ConvSpec.forward_hint doc).

    ``fused_fn`` (pallas conv producers only): replaces ``tile_fn`` with
    the fused delta-conv + consumer-detect kernel; called as
    fused_fn(storage, idx, count, out_cache) -> (out_cache, PreDetect),
    and the PreDetect rides out on the returned hint. Requires the
    cond-free capacity regime (pallas capacity == n_tiles), since the
    dense fallback cannot produce consumer-detect outputs.
    """
    if forward:
        assert hint is not None
        with jax.named_scope("accept_hinted"):
            in_cache, n_detect = _accept_hinted(x, state.in_cache, hint,
                                                g, cfg)
            mask = _forward_mask(hint.mask, g)
        # forwarding never inspects pixels; visited = hinted area
        n_pix = n_detect * (HINT_TILE * HINT_TILE)
    else:
        if tau is None:
            tau = spec.threshold
        with jax.named_scope("detect"):
            in_cache, mask, n_pix, n_detect = _detect_and_mask(
                x, state.in_cache, tau, g, cfg, hint,
                margin_fill=NEG_FILL if isinstance(spec, PoolSpec) else 0.0)
    # Pallas: capacity is free — the kernel loop is bounded by the dynamic
    # count, so a full-size index buffer costs only SMEM bytes, and the
    # overflow cond (whose branch boundaries force whole-cache copies)
    # disappears. The jnp path materializes `capacity` gathered windows, so
    # it keeps the configured bound + dense fallback.
    capacity = (g.n_tiles if cfg.backend == "pallas"
                else cfg.tile.capacity(g.n_tiles))
    with jax.named_scope("compact"):
        comp = compact.compact_mask(mask, capacity)

    predetect = None
    with jax.named_scope("delta_kernel"):
        if fused_fn is not None:
            assert capacity >= g.n_tiles, "fused detect needs cond-free path"
            out_cache, predetect = fused_fn(in_cache, comp.idx, comp.count,
                                            state.out_cache)
            overflow = jnp.zeros((), bool)
        elif capacity >= g.n_tiles:
            out_cache = tile_fn(in_cache, comp.idx, comp.count,
                                state.out_cache)
            overflow = jnp.zeros((), bool)
        else:
            out_cache = lax.cond(
                comp.overflow,
                lambda args: dense_fn(*args),
                lambda args: tile_fn(*args),
                (in_cache, comp.idx, comp.count, state.out_cache),
            )
            overflow = comp.overflow

    computed = jnp.where(overflow, g.n_tiles, comp.count)
    stats = {
        "changed_tiles": comp.count,
        "computed_tiles": computed,
        "n_tiles": g.n_tiles,
        "overflow": overflow,
        "changed_pixels": n_pix,
        "detect_tiles": n_detect,
    }
    # caches are tile-grid padded; consumers receive the padded Feature and
    # crop lazily (XLA eliminates the slice when the consumer is CB)
    out_hint = _out_hint(mask, overflow, g)
    if predetect is not None:
        out_hint = out_hint._replace(predetect=predetect)
    return None, CBLayerState(in_cache=in_cache, out_cache=out_cache), \
        stats, out_hint


def fuse_next_gate(spec, spec2, in_shape: Tuple[int, int, int],
                   cfg: PipelineConfig) -> bool:
    """STATIC eligibility of marking ``spec`` (producer, input ``in_shape``)
    with ``fuse_next_detect`` for consumer ``spec2`` — the single source of
    truth shared by convert_flagship, convert_graph_flagship, and the A/B
    harness (scripts/exp_fused_ab.py). Mirrors the runtime re-check in
    cb_conv_apply: both layers plain-pallas CB convs, consumer detecting
    (not forward_hint), lane-aligned producer width, kernel fuse_gate."""
    if not (isinstance(spec, ConvSpec) and spec.use_cb
            and isinstance(spec2, ConvSpec) and spec2.use_cb
            and not spec2.forward_hint):
        return False
    lcfg, lcfg2 = _layer_cfg(spec, cfg), _layer_cfg(spec2, cfg)
    if lcfg.backend != "pallas" or lcfg2.backend != "pallas":
        return False
    from .ops.pallas.delta_conv_detect import fuse_gate
    h, w, c = in_shape
    g = _geometry(spec, (h, w, lane_pad(c, lcfg)), lcfg)
    cout_pad = lane_pad(spec.features, lcfg)
    g2 = _geometry(spec2, (g.out_h, g.out_w, lane_pad(cout_pad, lcfg2)),
                   lcfg2)
    return cout_pad % LANE == 0 and fuse_gate(g, g2, lane_ok=True)


def cb_conv_apply(params: Tuple[jnp.ndarray, Optional[jnp.ndarray]],
                  state: CBLayerState, x: jnp.ndarray, spec: ConvSpec,
                  cfg: PipelineConfig, tau=None,
                  hint: Optional[DirtyHint] = None,
                  fuse_ctx: Optional[FuseCtx] = None):
    """One frame through a change-based conv layer.

    ``fuse_ctx`` (pallas backend only; CBNet.apply passes it when this
    spec has ``fuse_next_detect``): run the fused delta-conv + consumer
    detect kernel, returning the consumer's detect outputs as
    ``out_hint.predetect``. Silently ignored when the runtime fuse gate
    does not hold (the jnp/CPU twin of the same spec).

    Returns (y, state', stats, out_hint)."""
    cfg = _layer_cfg(spec, cfg)
    cout = spec.features
    compute_dtype = jnp.dtype(cfg.compute_dtype)

    if cfg.backend == "patch_stem":
        # Sparse Pallas stem on the lane-aligned flat4 cache: per-pixel
        # XLA detect/accept (reference semantics exact), receptive-field-
        # exact changed-tile mask, then the fused-assembly kernel
        # recomputes ONLY dirty (8,32) tiles — bit-identical to the
        # dense_cached stem's conv (ops/pallas/patch_stem.py), so tuned
        # taus and the downstream hint chain transfer unchanged while the
        # ~0.63 ms/frame full-map stem conv drops to ~0.13 ms at the
        # measured ~5% scene stem density.
        from .ops.pallas.patch_stem import patch_stem_conv
        if tau is None:
            tau = spec.threshold
        w, b = params
        is_clip = isinstance(x, flat4_ops.Flat4Clip)
        if is_clip:
            H, W, xc = x.h, x.w, x.cin
        else:
            xarr, H, W, xc = _unwrap(x)
            xarr = xarr[:H, :W, :xc]
        fg = flat4_ops.flat4_geom(H, W, xc)
        g = _geometry(spec, (H, W, xc), cfg)
        assert flat4_ops.supports((H, W, xc), spec.kernel, spec.stride,
                                  spec.dilation, spec.padding,
                                  spec.activation), (spec, (H, W, xc))
        fused_detect = (cfg.tile.tile_h == HINT_TILE
                        and cfg.tile.tile_w == HINT_TILE)
        with jax.named_scope("detect"):
            if fused_detect:
                # one banded Pallas sweep does detect+accept+RF-dilation
                # (ops/pallas/flat4_detect.py): replaces the XLA chain
                # below (~262 -> ~90 us/frame at 720p, r3-final trace).
                # The 8x8 cell mask it emits IS the hint/stats mask, and
                # the (8,32) stem-tile mask is the exact OR of each
                # tile's 4 cells (a stem tile's input window is the
                # union of its cells' windows). Gated on the 8x8 tile
                # config so all three mask grids coincide. With a
                # Flat4Clip input the kernel reads frame t straight out
                # of the HBM-resident chunk (no per-frame slice/pad).
                from .ops.pallas.flat4_detect import \
                    detect_accept_flat4_pallas
                if is_clip:
                    storage, cell_mask, npix1 = detect_accept_flat4_pallas(
                        x.clip, state.in_cache, tau, fg, frame_t=x.t,
                        interpret=cfg.interpret)
                else:
                    if state.scratch is not None:
                        # carry-scratch ingest (INGEST_DUS): margins are
                        # already zero in the carried buffer; write only
                        # the interior, in place under donation
                        x4f = flat4_ops.update_flat4(state.scratch, xarr,
                                                     fg)
                    else:
                        x4f = flat4_ops.to_flat4(xarr, fg, jnp.float32)
                    storage, cell_mask, npix1 = detect_accept_flat4_pallas(
                        x4f, state.in_cache, tau, fg,
                        interpret=cfg.interpret)
                cell_bool = cell_mask > 0
                n_pix = npix1[0]
                mask = jnp.any(
                    cell_bool.reshape(g.tiles_h, g.tiles_w, -1), axis=-1)
            else:
                if is_clip:
                    xarr = x.frame_hwc()
                storage, changed, n_pix = flat4_ops.detect_accept_flat4(
                    xarr, state.in_cache, tau, fg)
                mask = detect.changed_tile_mask(changed, g)
        cout_pad = state.out_cache.shape[-1]
        capacity = cfg.tile.capacity(g.n_tiles)
        with jax.named_scope("compact"):
            comp = compact.compact_mask(mask, capacity)

        def _dense_from_flat4(a):
            storage, out_cache, _idx, _count = a
            from . import network as _net
            wp, bp = _pad_wb(w, b, cout_pad)
            interior = flat4_ops.from_flat4(storage, fg).astype(
                compute_dtype)
            y = _net.dense_conv(interior, wp, bp, spec, compute_dtype)
            y = jnp.pad(y, ((0, g.out_h_pad - g.out_h),
                            (0, g.out_w_pad - g.out_w), (0, 0)))
            return y.astype(out_cache.dtype)

        def _kernel(a):
            storage, out_cache, idx, count = a
            return patch_stem_conv(storage, idx, count, w, b, out_cache,
                                   fg, spec.activation, compute_dtype,
                                   interpret=cfg.interpret)

        with jax.named_scope("patch_conv"):
            if capacity >= g.n_tiles:
                out_cache = _kernel((storage, state.out_cache, comp.idx,
                                     comp.count))
                overflow = jnp.zeros((), bool)
            else:
                # overflow -> dense conv from the same accepted cache;
                # value-exact by out_cache == f(in_cache) (bit-identical
                # at 720p bf16, probe_fused_stem.py)
                out_cache = lax.cond(
                    comp.overflow, _dense_from_flat4, _kernel,
                    (storage, state.out_cache, comp.idx, comp.count))
                overflow = comp.overflow
        # stats on the CONFIGURED tile grid (band_cached precedent): one
        # (8,32) kernel tile = tile_scale fine tiles, so effective_flops
        # prices the wider recompute granularity honestly
        g_fine = conv_tile_geometry((H, W, xc), spec.kernel, spec.stride,
                                    spec.dilation, spec.padding,
                                    cfg.tile.tile_h, cfg.tile.tile_w)
        tile_scale = g_fine.n_tiles // g.n_tiles
        stats = {
            "changed_tiles": jnp.sum(
                cell_bool if fused_detect
                else detect.changed_tile_mask(changed, g_fine),
                dtype=jnp.int32),
            "computed_tiles": jnp.where(overflow, g.n_tiles,
                                        comp.count) * tile_scale,
            "n_tiles": g_fine.n_tiles,
            "overflow": overflow,
            "changed_pixels": n_pix,
            "detect_tiles": jnp.asarray(
                cdiv(H, HINT_TILE) * cdiv(W, HINT_TILE), jnp.int32),
        }
        # hint at the fixed HINT_TILE grid: the exact dilated change
        # region, identical to what the dense_cached stem emits (the
        # (8,32) recompute is a value-exact superset; band precedent)
        g_hint = conv_tile_geometry((H, W, xc), spec.kernel, spec.stride,
                                    spec.dilation, spec.padding,
                                    HINT_TILE, HINT_TILE)
        hint_mask = cell_bool if fused_detect \
            else detect.changed_tile_mask(changed, g_hint)
        out_hint = _out_hint(hint_mask, overflow, g_hint)
        yl = Feature(out_cache, g.out_h, g.out_w, cout)
        # carry the ingest scratch forward (INGEST_DUS): the buffer must
        # persist across frames for its constant-zero margins and the
        # in-place interior DUS to work under donation
        new_scratch = (x4f if (fused_detect and not is_clip
                               and state.scratch is not None)
                       else state.scratch)
        return yl, CBLayerState(in_cache=storage, out_cache=out_cache,
                                scratch=new_scratch), \
            stats, out_hint

    if cfg.backend == "dense_cached_flat":
        # dense_cached with the FLAT (H, W*C) cache view: identical memory
        # to HWC (reshape is free, NO transpose), detect ops all run on
        # clean rank-2 W*C-lane layouts (detect.detect_and_update_flat
        # doc). The conv writes its output LANE-PADDED directly (padded
        # weights) so the consumer's pad_lanes is a no-op — the per-frame
        # pad of a 64-ch stem output measured 0.70 ms at 720p (xprof r3).
        if tau is None:
            tau = spec.threshold
        w, b = params
        xarr, H, W, xc = _unwrap(x)
        xarr = xarr[:H, :W, :xc]
        g = _geometry(spec, (H, W, xc), cfg)
        xf = xarr.reshape(H, W * xc)
        storage, changed = detect.detect_and_update_flat(
            xf, state.in_cache, tau, xc)
        mask = detect.changed_tile_mask(changed, g)
        npix = jnp.sum(changed, dtype=jnp.int32).reshape(1)
        from . import network as _net
        wp, bp = _pad_wb(w, b, state.out_cache.shape[-1])
        y = _net.dense_conv(storage.reshape(H, W, xc), wp, bp, spec,
                            compute_dtype)
        y = jnp.pad(y, ((0, g.out_h_pad - g.out_h),
                        (0, g.out_w_pad - g.out_w), (0, 0)))
        out_cache = y.astype(state.out_cache.dtype)
        stats = {
            "changed_tiles": jnp.sum(mask, dtype=jnp.int32),
            "computed_tiles": jnp.asarray(g.n_tiles, jnp.int32),
            "n_tiles": g.n_tiles,
            "overflow": jnp.zeros((), bool),
            "changed_pixels": npix[0],
            "detect_tiles": jnp.asarray(
                cdiv(H, HINT_TILE) * cdiv(W, HINT_TILE), jnp.int32),
        }
        out_hint = _out_hint(mask, jnp.zeros((), bool), g)
        yl = Feature(out_cache, g.out_h, g.out_w, cout)
        return yl, CBLayerState(in_cache=storage, out_cache=out_cache), \
            stats, out_hint

    x, w, b, g = _conv_prep(params, x, spec, cfg)

    if cfg.backend == "band_cached":
        # Full-width ROW-BAND sparse stem: per-pixel XLA detect (the fine
        # 8x8 hint chain is preserved for consumers), then recompute ONLY
        # the dirty (th x out_w) output bands — contiguous full-width
        # gathers -> one batched im2col MXU matmul -> row-band scatter.
        # Rationale: the dense_cached stem recomputes AND rewrites the
        # full out map every frame (65% of the 720p scene frame, xprof
        # r3); the 8x8-tile XLA sparse stem lost 3-6x to thousands of
        # tiny scattered slices (EXP_variants 'stem=jnp'). Bands keep
        # every HBM access contiguous. _geometry gave g tiles_w == 1, so
        # compacted flat tile ids ARE band (tile-row) indices.
        if tau is None:
            tau = spec.threshold
        with jax.named_scope("detect"):
            storage, changed, n_pix, n_detect = _detect_xla(
                x, state.in_cache, tau, g, hint)
            band_mask = detect.changed_tile_mask(changed, g)
        cout_pad = state.out_cache.shape[-1]
        w, b = _pad_wb(w, b, cout_pad)
        capacity = cfg.tile.capacity(g.n_tiles)
        with jax.named_scope("compact"):
            comp = compact.compact_mask(band_mask, capacity)
        with jax.named_scope("band_conv"):
            if capacity >= g.n_tiles:
                out_cache = delta_conv_jnp(
                    storage, comp.idx, w, b, state.out_cache, g,
                    spec.activation, compute_dtype)
                overflow = jnp.zeros((), bool)
            else:
                # overflow -> dense fallback; dense_conv_shifted shares
                # conv_tiles' _accumulate epilogue, so the fallback stays
                # bit-aligned with the band path (lax.cond contract)
                out_cache = lax.cond(
                    comp.overflow,
                    lambda a: dense_conv_shifted(
                        a[0], w, b, g, spec.activation,
                        compute_dtype).astype(a[1].dtype),
                    lambda a: delta_conv_jnp(
                        a[0], a[2], w, b, a[1], g, spec.activation,
                        compute_dtype),
                    (storage, state.out_cache, comp.idx))
                overflow = comp.overflow
        # hint at the fixed HINT_TILE grid: band recompute is a value-exact
        # superset, so consumers only need the exact dilated change region
        # (the dense_cached argument); the band mask would overdirty them
        # by a full row of hint tiles per band
        g_hint = conv_tile_geometry((g.in_h, g.in_w, g.cin), spec.kernel,
                                    spec.stride, spec.dilation, spec.padding,
                                    HINT_TILE, HINT_TILE)
        hint_mask = detect.changed_tile_mask(changed, g_hint)
        # stats on the CONFIGURED tile grid (cfg.tile), the unit every
        # other layer reports in: a band = one row of that grid
        # (identical tile_h), so counters stay comparable and
        # effective_flops prices the band overcompute honestly. Counting
        # changed on the HINT grid instead would disagree with
        # computed/n_tiles whenever cfg.tile != 8x8 (review r3).
        g_fine = conv_tile_geometry((g.in_h, g.in_w, g.cin), spec.kernel,
                                    spec.stride, spec.dilation, spec.padding,
                                    cfg.tile.tile_h, cfg.tile.tile_w)
        stats = {
            "changed_tiles": jnp.sum(
                detect.changed_tile_mask(changed, g_fine), dtype=jnp.int32),
            "computed_tiles": jnp.where(overflow, g.n_tiles,
                                        comp.count) * g_fine.tiles_w,
            "n_tiles": g_fine.n_tiles,
            "overflow": overflow,
            "changed_pixels": n_pix,
            "detect_tiles": n_detect,
        }
        out_hint = _out_hint(hint_mask, overflow, g_hint)
        yl = Feature(out_cache, g.out_h, g.out_w, cout)
        return yl, CBLayerState(in_cache=storage, out_cache=out_cache), \
            stats, out_hint

    if cfg.backend == "dense_cached":
        # detect + full dense conv FROM THE ACCEPTED CACHE every frame:
        # value-exact by the out_cache == f(in_cache) invariant, produces
        # the hint chain, zero gather/scatter machinery. The right mode for
        # layers where CB bookkeeping outweighs the conv (e.g. cin=3 stems).
        if tau is None:
            tau = spec.threshold
        with jax.named_scope("detect"):
            storage, mask, n_pix, n_detect = _detect_and_mask(
                x, state.in_cache, tau, g, cfg, hint)
        # XLA-native conv on the interior: the k^2 shifted-matmul form is
        # right for tiles but materializes the full fp32 accumulator k^2
        # times on a full map (~GBs of traffic); lax.conv fuses it.
        # Weights are padded to the out cache's LANE-padded width so the
        # conv writes padded channels directly (zero pad lanes: zero
        # weights + zero bias) and the consumer's pad_lanes is a no-op.
        from . import network as _net
        with jax.named_scope("cached_conv"):
            cout_pad = state.out_cache.shape[-1]
            w, b = _pad_wb(w, b, cout_pad)
            interior = storage_interior(storage, g).astype(compute_dtype)
            y = _net.dense_conv(interior, w, b, spec, compute_dtype)
        with jax.named_scope("out_pad"):
            y = jnp.pad(y, ((0, g.out_h_pad - g.out_h),
                            (0, g.out_w_pad - g.out_w), (0, 0)))
            out_cache = y.astype(state.out_cache.dtype)
        stats = {
            "changed_tiles": jnp.sum(mask, dtype=jnp.int32),
            "computed_tiles": jnp.asarray(g.n_tiles, jnp.int32),
            "n_tiles": g.n_tiles,
            "overflow": jnp.zeros((), bool),
            "changed_pixels": n_pix,
            "detect_tiles": n_detect,
        }
        out_hint = _out_hint(mask, jnp.zeros((), bool), g)
        yl = Feature(out_cache, g.out_h, g.out_w, cout)
        return yl, CBLayerState(in_cache=storage, out_cache=out_cache), \
            stats, out_hint

    fused_fn = None
    if cfg.backend == "pallas":
        from .ops.pallas.delta_conv import delta_conv_pallas

        def tile_fn(storage, idx, count, out_cache):
            return delta_conv_pallas(
                storage, idx, w, b, out_cache, g,
                spec.activation, compute_dtype, count=count,
                interpret=cfg.interpret)

        if fuse_ctx is not None:
            from .ops.pallas import delta_conv_detect as _dcd
            spec2 = fuse_ctx.spec
            cfg2 = _layer_cfg(spec2, cfg)
            cout_pad = w.shape[-1]
            g2 = _geometry(spec2, (g.out_h, g.out_w,
                                   lane_pad(cout_pad, cfg2)), cfg2)
            # runtime re-check of the static converter gate: fall back to
            # the plain kernel on any mismatch (value-identical)
            if (cfg2.backend == "pallas" and cout_pad % LANE == 0
                    and fuse_ctx.in_cache.shape == g2.store_shape
                    and _dcd.fuse_gate(g, g2, lane_ok=True)):
                tau2 = (fuse_ctx.tau if fuse_ctx.tau is not None
                        else spec2.threshold)

                def fused_fn(storage, idx, count, out_cache):
                    new_out, new_nc, maskf, npix = \
                        _dcd.delta_conv_detect_pallas(
                            storage, idx, w, b, out_cache, g,
                            spec.activation, compute_dtype,
                            fuse_ctx.in_cache, tau2, g2, count=count,
                            interpret=cfg.interpret)
                    return new_out, PreDetect(in_cache=new_nc, mask=maskf,
                                              npix=npix, n_detect=count)
    else:
        def tile_fn(storage, idx, count, out_cache):
            del count  # jnp path relies on sentinel-drop instead
            return delta_conv_jnp(storage, idx, w, b,
                                  out_cache, g, spec.activation, compute_dtype)

    def dense_fn(storage, idx, count, out_cache):
        del idx, count
        y = dense_conv_shifted(storage, w, b, g,
                               spec.activation, compute_dtype)
        return y.astype(out_cache.dtype)

    forward = bool(spec.forward_hint) and hint is not None
    y, st, stats, out_hint = _run_gated(spec, state, x, g, cfg, tile_fn,
                                        dense_fn, tau, hint,
                                        forward=forward, fused_fn=fused_fn)
    return Feature(st.out_cache, g.out_h, g.out_w, cout), st, stats, out_hint


def _pad_wb(w, b, cout_pad: int):
    """Pad conv weights/bias out-channels to the stored lane width (the
    one contract behind every lane-padded out cache; apply and refresh
    branches of the same layer MUST agree on it — lax.cond pytree rule)."""
    if w.shape[3] < cout_pad:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, cout_pad - w.shape[3])))
        if b is not None:
            b = jnp.pad(b, (0, cout_pad - b.shape[0]))
    return w, b


def _layer_cfg(spec, cfg: PipelineConfig) -> PipelineConfig:
    """Apply the spec's per-layer backend override to the pipeline cfg."""
    if spec.backend is not None and spec.backend != cfg.backend:
        import dataclasses as _dc
        cfg = _dc.replace(cfg, backend=spec.backend)
    return cfg


def _conv_prep(params, x, spec: ConvSpec, cfg: PipelineConfig,
               crop: bool = False):
    """Shared conv-layer input preamble: unwrap the (possibly padded)
    Feature, lane-pad/crop input and weights to the storage widths, build
    the tile geometry.

    ``crop=True`` additionally slices x to its logical spatial dims — used
    by the refresh path; the apply path keeps the padded array so the
    zero-copy Feature handoff never materializes a crop (the Pallas detect
    reads logical coordinates out of the padded buffer).

    Returns (x, w, b, g). Used by BOTH cb_conv_apply and cb_conv_refresh
    so the two branches of the refresh lax.cond cannot diverge in
    shape/padding semantics.
    """
    w, b = params
    x, H, W, xc = _unwrap(x)
    cin_pad = lane_pad(xc, cfg)
    cout_pad = lane_pad(spec.features, cfg)
    if x.shape[2] < cin_pad:
        x = pad_lanes(x, cin_pad)
    elif x.shape[2] > cin_pad:
        x = x[..., :cin_pad]
    if cin_pad != w.shape[2] or cout_pad != w.shape[3]:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cin_pad - w.shape[2]),
                        (0, cout_pad - w.shape[3])))
        if b is not None:
            b = jnp.pad(b, (0, cout_pad - b.shape[0]))
    g = _geometry(spec, (H, W, cin_pad), cfg)
    if crop and x.shape[:2] != (H, W):
        x = x[:H, :W]
    return x, w, b, g


def _pool_prep(x, spec: PoolSpec, cfg: PipelineConfig, crop: bool = False):
    """Pool-layer twin of _conv_prep: returns (x, g, cout)."""
    x, H, W, xc = _unwrap(x)
    cpad = lane_pad(xc, cfg)
    if x.shape[2] < cpad:
        x = pad_lanes(x, cpad)
    elif x.shape[2] > cpad:
        x = x[..., :cpad]
    g = _geometry(spec, (H, W, cpad), cfg)
    if crop and x.shape[:2] != (H, W):
        x = x[:H, :W]
    return x, g, xc


def _full_stats(g: TileGeometry, tile_scale: int = 1) -> Dict[str, Any]:
    """Stats pytree for a full (refresh) recompute — same structure/dtypes
    as _run_gated's stats so lax.cond branches match.

    ``tile_scale``: band_cached layers report in FINE-grid tile units
    (one band = a full row of fine tiles; cb_conv_apply band branch), so
    their refresh stats must scale the same way or effective_flops
    underprices refresh frames for that layer."""
    return {
        "changed_tiles": jnp.asarray(g.n_tiles * tile_scale, jnp.int32),
        "computed_tiles": jnp.asarray(g.n_tiles * tile_scale, jnp.int32),
        "n_tiles": g.n_tiles * tile_scale,
        "overflow": jnp.zeros((), bool),
        "changed_pixels": jnp.asarray(g.in_h * g.in_w, jnp.int32),
        "detect_tiles": jnp.asarray(
            cdiv(g.in_h, HINT_TILE) * cdiv(g.in_w, HINT_TILE), jnp.int32),
    }


def _full_hint(g: TileGeometry) -> DirtyHint:
    return DirtyHint(mask=jnp.ones((cdiv(g.out_h, HINT_TILE),
                                    cdiv(g.out_w, HINT_TILE)), bool))


def cb_conv_refresh(params, state: CBLayerState, x, spec: ConvSpec,
                    cfg: PipelineConfig):
    """Full refresh of a CB conv layer: accept the whole input into the
    cache and recompute the whole output with the DENSE XLA conv.

    The periodic refresh frame (runner.scan_video refresh_every) used to
    run as tau=-1 through the CB kernels, whose count-bounded serial
    tile loops are built for sparse frames — a full-map frame through them
    costs several times the dense conv (measured ~0.3 ms/frame amortized
    at K=32). This path computes the refresh frame at dense-path speed and
    is value-exact by the same out_cache == f(in_cache) invariant (the
    accumulation order differs from the tile kernels by fp rounding only,
    exactly like the overflow fallback).

    Returns (y, state', stats, hint) with the same pytree structure as
    cb_conv_apply.
    """
    cfg = _layer_cfg(spec, cfg)
    cout = spec.features
    compute_dtype = jnp.dtype(cfg.compute_dtype)

    if cfg.backend == "patch_stem":
        # accept the whole frame into the flat4 cache, full dense conv —
        # pytree structure matches the apply branch (stats in fine-grid
        # tile units via tile_scale, like the apply branch reports)
        w, b = params
        xarr, H, W, xc = _unwrap(x)
        xarr = xarr[:H, :W, :xc]
        fg = flat4_ops.flat4_geom(H, W, xc)
        g = _geometry(spec, (H, W, xc), cfg)
        storage = flat4_ops.to_flat4(xarr, fg, state.in_cache.dtype)
        from . import network as _net
        wp, bp = _pad_wb(w, b, state.out_cache.shape[-1])
        y = _net.dense_conv(xarr.astype(compute_dtype), wp, bp, spec,
                            compute_dtype)
        y = jnp.pad(y, ((0, g.out_h_pad - g.out_h),
                        (0, g.out_w_pad - g.out_w), (0, 0)))
        out_cache = y.astype(state.out_cache.dtype)
        yl = Feature(out_cache, g.out_h, g.out_w, cout)
        tile_scale = (cdiv(g.out_h, cfg.tile.tile_h)
                      * cdiv(g.out_w, cfg.tile.tile_w)) // g.n_tiles
        return yl, CBLayerState(in_cache=storage, out_cache=out_cache), \
            _full_stats(g, tile_scale), _full_hint(g)

    if cfg.backend == "dense_cached_flat":
        # accept the whole frame into the flat cache, full conv (padded
        # weights) — pytree structure matches the apply branch above
        w, b = params
        xarr, H, W, xc = _unwrap(x)
        xarr = xarr[:H, :W, :xc]
        g = _geometry(spec, (H, W, xc), cfg)
        storage = xarr.reshape(H, W * xc).astype(state.in_cache.dtype)
        from . import network as _net
        wp, bp = _pad_wb(w, b, state.out_cache.shape[-1])
        y = _net.dense_conv(storage.reshape(H, W, xc), wp, bp, spec,
                            compute_dtype)
        y = jnp.pad(y, ((0, g.out_h_pad - g.out_h),
                        (0, g.out_w_pad - g.out_w), (0, 0)))
        out_cache = y.astype(state.out_cache.dtype)
        yl = Feature(out_cache, g.out_h, g.out_w, cout)
        return yl, CBLayerState(in_cache=storage, out_cache=out_cache), \
            _full_stats(g), _full_hint(g)

    x, w, b, g = _conv_prep(params, x, spec, cfg, crop=True)
    # match the out cache's stored lane width (dense_cached stems write
    # lane-padded output via padded weights; cb_layer_init doc)
    w, b = _pad_wb(w, b, state.out_cache.shape[-1])

    # Rebuild the padded storage from scratch (margins are CONSTANT zeros
    # by make_storage's contract) instead of dynamic-update-slicing the
    # carried buffer: a full-interior DUS into a donated scan carry is
    # catastrophically slow on this backend (a 236 MB aligned DUS
    # microbenchmark never completed; measured +8.4 ms/frame inside
    # apply_refresh), while a fresh pad writes at memory speed.
    storage = jnp.pad(x.astype(state.in_cache.dtype),
                      ((g.store_lo_h, g.store_hi_h),
                       (g.store_lo_w, g.store_hi_w), (0, 0)))
    from . import network as _net
    y = _net.dense_conv(x.astype(compute_dtype), w, b, spec, compute_dtype)
    y = jnp.pad(y, ((0, g.out_h_pad - g.out_h),
                    (0, g.out_w_pad - g.out_w), (0, 0)))
    out_cache = y.astype(state.out_cache.dtype)
    yl = Feature(out_cache, g.out_h, g.out_w, cout)
    # band layers report on the configured tile grid (apply-branch stats
    # contract): one band = cdiv(out_w, tile_w) grid tiles
    tile_scale = (cdiv(g.out_w, cfg.tile.tile_w)
                  if cfg.backend == "band_cached" else 1)
    return yl, CBLayerState(in_cache=storage, out_cache=out_cache), \
        _full_stats(g, tile_scale), _full_hint(g)


def cb_pool_refresh(state: CBLayerState, x, spec: PoolSpec,
                    cfg: PipelineConfig):
    """Full refresh of a CB pool layer (see cb_conv_refresh)."""
    cfg = _layer_cfg(spec, cfg)
    x, g, cout = _pool_prep(x, spec, cfg, crop=True)
    # fresh pad, not DUS-into-carry — see cb_conv_refresh
    storage = jnp.pad(x.astype(state.in_cache.dtype),
                      ((g.store_lo_h, g.store_hi_h),
                       (g.store_lo_w, g.store_hi_w), (0, 0)),
                      constant_values=NEG_FILL)
    out_cache = dense_pool(storage, g).astype(state.out_cache.dtype)
    yl = Feature(out_cache, g.out_h, g.out_w, cout)
    # elided-input-cache pools (fused forward mode) keep their (1,1,1)
    # placeholder: the transient storage above is compute-only
    new_in = state.in_cache if spec.elide_in_cache else storage
    return yl, CBLayerState(in_cache=new_in, out_cache=out_cache), \
        _full_stats(g), _full_hint(g)


def fused_pool_gate(spec: PoolSpec, g, cfg: PipelineConfig,
                    channels: int) -> bool:
    """STATIC eligibility of the hint-forwarded fused pool kernel — the
    single source of truth shared by the runtime (cb_pool_apply) and the
    tuner's dead-tau analysis (tuner._tau_is_dead); the two copies
    diverging mis-tunes thresholds (bitten once, commit 2b3f121).

    Conditions: pallas backend; aligned window==stride==(p,p) with p>=2
    (p=1 would pool an 8x16 block spanning two out tiles while the kernel
    marks one mask cell — stale-hint hole); pooled paired-block width
    8-sublane-aligned (Mosaic HBM slicing rule); full 8x8 compute tiles;
    full 128 lanes; exact block-grid divisibility (a clamped edge block's
    pooled region would span two out tiles)."""
    if not (isinstance(spec, PoolSpec) and cfg.backend == "pallas"):
        return False
    p = spec.stride[0]
    return (spec.window == spec.stride == (p, p)
            and p >= 2 and HINT_TILE % p == 0
            and (2 * HINT_TILE // p) % 8 == 0
            and g.th == HINT_TILE and g.tw == HINT_TILE
            and channels % 128 == 0
            and g.in_w % (2 * HINT_TILE) == 0
            and g.in_h % HINT_TILE == 0)


def cb_pool_apply(state: CBLayerState, x: jnp.ndarray, spec: PoolSpec,
                  cfg: PipelineConfig, tau=None,
                  hint: Optional[DirtyHint] = None):
    """One frame through a change-based max-pool layer.

    Returns (y: Feature, state', stats, out_hint)."""
    cfg = _layer_cfg(spec, cfg)
    x, g, cout = _pool_prep(x, spec, cfg)

    if (spec.forward_hint and hint is not None
            and fused_pool_gate(spec, g, cfg, x.shape[-1])):
        # CB17 mask-forwarding pool: ONE fused kernel over the producer's
        # dirty list — no detection, no input-cache traffic, tau unused
        # (PoolSpec.forward_hint doc; value-exact superset recompute).
        # Hint tiles pair up in W (8x16 blocks) for the alignment rule.
        from .ops.pallas.delta_pool import detect_pool_fused
        hm = hint.mask
        if hm.shape[1] % 2:  # defensive; in_w divisibility implies even
            hm = jnp.pad(hm, ((0, 0), (0, 1)))
        pair = jnp.logical_or(hm[:, 0::2], hm[:, 1::2])
        dcomp = compact.compact_mask(pair, pair.size)
        out_cache, maskf = detect_pool_fused(
            x, state.out_cache, dcomp.idx, dcomp.count, g,
            hint_h=HINT_TILE, hint_w=2 * HINT_TILE, interpret=cfg.interpret)
        mask = maskf > 0.5
        touched = jnp.sum(mask, dtype=jnp.int32)
        stats = {
            "changed_tiles": touched,
            "computed_tiles": touched,
            "n_tiles": g.n_tiles,
            "overflow": jnp.zeros((), bool),
            # forwarding never inspects pixels; visited = hinted area
            # (counts in 8x8 hint-tile units: each block is 2 tiles)
            "changed_pixels": dcomp.count * (2 * HINT_TILE * HINT_TILE),
            "detect_tiles": dcomp.count * 2,
        }
        out_hint = _out_hint(mask, jnp.zeros((), bool), g)
        yl = Feature(out_cache, g.out_h, g.out_w, cout)
        return yl, CBLayerState(in_cache=state.in_cache,
                                out_cache=out_cache), stats, out_hint

    if spec.elide_in_cache:
        # the converter only sets this when the fused gate above provably
        # holds and the producer always hints — reaching the re-detection
        # fallback means the net was built inconsistently (the input
        # cache here is a (1,1,1) placeholder and cannot serve detection)
        raise AssertionError(
            "elide_in_cache pool fell through the fused gate "
            f"(hint={'present' if hint is not None else 'MISSING'}, "
            f"backend={cfg.backend}); rebuild via the flagship converter")

    if cfg.backend == "pallas":
        from .ops.pallas.delta_pool import delta_pool_pallas

        def tile_fn(storage, idx, count, out_cache):
            return delta_pool_pallas(storage, idx, out_cache, g,
                                     count=count, interpret=cfg.interpret)
    else:
        def tile_fn(storage, idx, count, out_cache):
            del count
            return delta_pool_jnp(storage, idx, out_cache, g)

    def dense_fn(storage, idx, count, out_cache):
        del idx, count
        return dense_pool(storage, g).astype(out_cache.dtype)

    y, st, stats, out_hint = _run_gated(spec, state, x, g, cfg, tile_fn,
                                        dense_fn, tau, hint)
    return Feature(st.out_cache, g.out_h, g.out_w, cout), st, stats, out_hint
