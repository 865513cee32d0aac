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
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax import lax

from .config import ConvSpec, PipelineConfig, PoolSpec
from .ops import compact, detect
from .ops.delta_conv import (delta_conv_jnp, dense_conv_shifted, pad_input)
from .ops.delta_pool import delta_pool_jnp, dense_pool
from .ops.geometry import TileGeometry, conv_tile_geometry

NEG_FILL = -3.0e38  # SAME-padding fill for max pooling (finite "-inf")


@struct.dataclass
class CBLayerState:
    in_cache: jnp.ndarray   # (H, W, Cin)  last accepted input
    out_cache: jnp.ndarray  # (Ho, Wo, Cout) cached output


def _geometry(spec, in_shape: Tuple[int, int, int], cfg: PipelineConfig
              ) -> TileGeometry:
    if isinstance(spec, ConvSpec):
        return conv_tile_geometry(in_shape, spec.kernel, spec.stride,
                                  spec.dilation, spec.padding,
                                  cfg.tile.tile_h, cfg.tile.tile_w)
    return conv_tile_geometry(in_shape, spec.window, spec.stride, (1, 1),
                              spec.padding, cfg.tile.tile_h, cfg.tile.tile_w)


def conv_out_shape(spec: ConvSpec, in_shape, cfg: PipelineConfig):
    g = _geometry(spec, in_shape, cfg)
    return (g.out_h, g.out_w, spec.features)


def pool_out_shape(spec: PoolSpec, in_shape, cfg: PipelineConfig):
    g = _geometry(spec, in_shape, cfg)
    return (g.out_h, g.out_w, in_shape[2])


def cb_layer_init(spec, in_shape: Tuple[int, int, int], cfg: PipelineConfig
                  ) -> CBLayerState:
    """Allocate per-layer caches (HBM-resident across frames)."""
    dtype = jnp.dtype(cfg.cache_dtype)
    cout = spec.features if isinstance(spec, ConvSpec) else in_shape[2]
    g = _geometry(spec, in_shape, cfg)
    return CBLayerState(
        in_cache=jnp.full(in_shape, detect.COLD_START_FILL, dtype=dtype),
        out_cache=jnp.zeros((g.out_h_pad, g.out_w_pad, cout), dtype=dtype),
    )


def _run_gated(spec, state: CBLayerState, x: jnp.ndarray, g: TileGeometry,
               cfg: PipelineConfig, tile_fn, dense_fn, tau=None
               ) -> Tuple[jnp.ndarray, CBLayerState, Dict[str, Any]]:
    """Shared C1->C3 + overflow-cond skeleton for conv and pool layers.

    ``tau`` may be a traced scalar (threshold tuning sweeps thresholds as
    runtime values — one compile serves the whole sweep); defaults to the
    spec's static threshold.
    """
    if tau is None:
        tau = spec.threshold
    in_cache, changed = detect.detect_and_update(x, state.in_cache, tau)
    mask = detect.changed_tile_mask(changed, g)
    capacity = cfg.tile.capacity(g.n_tiles)
    comp = compact.compact_mask(mask, capacity)

    if capacity >= g.n_tiles:
        out_cache = tile_fn(in_cache, comp.idx, comp.count, state.out_cache)
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
        "changed_pixels": jnp.sum(changed, dtype=jnp.int32),
    }
    # caches are tile-grid padded; the layer's logical output is the crop
    y = out_cache[:g.out_h, :g.out_w].astype(jnp.dtype(cfg.compute_dtype))
    return y, CBLayerState(in_cache=in_cache, out_cache=out_cache), stats


def cb_conv_apply(params: Tuple[jnp.ndarray, Optional[jnp.ndarray]],
                  state: CBLayerState, x: jnp.ndarray, spec: ConvSpec,
                  cfg: PipelineConfig, tau=None
                  ) -> Tuple[jnp.ndarray, CBLayerState, Dict[str, Any]]:
    """One frame through a change-based conv layer."""
    w, b = params
    g = _geometry(spec, x.shape, cfg)
    compute_dtype = jnp.dtype(cfg.compute_dtype)

    use_pallas = (cfg.backend == "pallas" and spec.dilation == (1, 1))
    if use_pallas:
        from .ops.pallas.delta_conv import delta_conv_pallas

        def tile_fn(in_cache, idx, count, out_cache):
            return delta_conv_pallas(
                pad_input(in_cache, g), idx, w, b, out_cache, g,
                spec.activation, compute_dtype, count=count,
                interpret=cfg.interpret)
    else:
        def tile_fn(in_cache, idx, count, out_cache):
            del count  # jnp path relies on sentinel-drop instead
            return delta_conv_jnp(pad_input(in_cache, g), idx, w, b,
                                  out_cache, g, spec.activation, compute_dtype)

    def dense_fn(in_cache, idx, count, out_cache):
        del idx, count
        y = dense_conv_shifted(pad_input(in_cache, g), w, b, g,
                               spec.activation, compute_dtype)
        return y.astype(out_cache.dtype)

    return _run_gated(spec, state, x, g, cfg, tile_fn, dense_fn, tau)


def cb_pool_apply(state: CBLayerState, x: jnp.ndarray, spec: PoolSpec,
                  cfg: PipelineConfig, tau=None
                  ) -> Tuple[jnp.ndarray, CBLayerState, Dict[str, Any]]:
    """One frame through a change-based max-pool layer."""
    g = _geometry(spec, x.shape, cfg)

    def pad_pool(v):
        return jnp.pad(v, ((g.pad_lo_h, g.pad_hi_h),
                           (g.pad_lo_w, g.pad_hi_w), (0, 0)),
                       constant_values=NEG_FILL)

    if cfg.backend == "pallas":
        from .ops.pallas.delta_pool import delta_pool_pallas

        def tile_fn(in_cache, idx, count, out_cache):
            return delta_pool_pallas(pad_pool(in_cache), idx, out_cache, g,
                                     count=count, interpret=cfg.interpret)
    else:
        def tile_fn(in_cache, idx, count, out_cache):
            del count
            return delta_pool_jnp(pad_pool(in_cache), idx, out_cache, g)

    def dense_fn(in_cache, idx, count, out_cache):
        del idx, count
        return dense_pool(pad_pool(in_cache), g).astype(out_cache.dtype)

    return _run_gated(spec, state, x, g, cfg, tile_fn, dense_fn, tau)
