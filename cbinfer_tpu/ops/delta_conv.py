"""Stages C4-C6: gather -> delta-conv GEMM -> scatter (jnp/XLA backend).

Reference realization (SURVEY.md C4-C6): three CUDA kernels — sparse im2col
gather into an X matrix, cuBLAS SGEMM, and a scatter of result columns into
the cached output map (arXiv 1704.04313 §3.3-3.5). TPU-native reformulation:
the unit is an output TILE, the gathered operand is the tile's input window
(incl. receptive-field halo), and the GEMM is expressed as k_h*k_w shifted
matmuls over the compacted tile batch — each a (cap*th*tw, cin) x (cin, cout)
contraction that maps directly onto the MXU. The same math runs inside the
fused Pallas kernel (ops/pallas/delta_conv.py); this module is the XLA
bring-up path and the numerical reference.

The dense fallback (`dense_conv_shifted`) uses the identical shifted-matmul
accumulation order so overflow frames stay numerically aligned with the
tile path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .geometry import TileGeometry


def make_storage(g: TileGeometry, fill, margin_fill, dtype) -> jnp.ndarray:
    """Allocate the persistent spatially-padded input-cache storage: interior
    (the logical map) = ``fill``; margins (conv zero padding / pool -inf,
    plus DMA slack) = ``margin_fill``, written once and never again — no
    per-frame pad copy (SURVEY.md §7 'in-place cache update')."""
    st = jnp.full(g.store_shape, margin_fill, dtype)
    interior = jnp.full((g.in_h, g.in_w, g.cin), fill, dtype)
    return lax.dynamic_update_slice(st, interior,
                                    (g.store_lo_h, g.store_lo_w, 0))


def storage_interior(storage: jnp.ndarray, g: TileGeometry) -> jnp.ndarray:
    return lax.dynamic_slice(storage, (g.store_lo_h, g.store_lo_w, 0),
                             (g.in_h, g.in_w, storage.shape[-1]))


def storage_update_interior(storage: jnp.ndarray, interior: jnp.ndarray,
                            g: TileGeometry) -> jnp.ndarray:
    return lax.dynamic_update_slice(storage, interior,
                                    (g.store_lo_h, g.store_lo_w, 0))


def gather_windows(storage: jnp.ndarray, idx: jnp.ndarray, g: TileGeometry
                   ) -> jnp.ndarray:
    """C4: gather (capacity, win_h, win_w, cin) input windows at tile ids
    from the padded storage (tile (i, j)'s window starts at storage coords
    (i*th*sh, j*tw*sw + dx0)).

    Sentinel ids (n_tiles) are clamped to the LAST tile (n_tiles - 1) — their results are dropped
    at scatter, so the gathered garbage is harmless.
    """
    safe = jnp.minimum(idx, g.n_tiles - 1)
    ti = safe // g.tiles_w
    tj = safe % g.tiles_w
    sh, sw = g.stride

    def one(i, j):
        return lax.dynamic_slice(
            storage, (i * g.th * sh, j * g.tw * sw + g.dx0, 0),
            (g.win_h, g.win_w, g.cin))

    return jax.vmap(one)(ti, tj)


def use_im2col(g: TileGeometry) -> bool:
    """Small-cin layers (3-channel stems) contract over K = cin*k^2 <= ~128:
    k^2 separate K=cin matmuls starve the MXU AND force k^2 full passes over
    the fp32 accumulator (measured ~5ms/refresh-frame at 720p); one im2col
    matmul is the right shape. Large-cin layers keep the shifted form (no
    k^2-times patch materialization). The SAME gate must apply to the tile
    path and the dense fallback so overflow frames stay bit-aligned."""
    return g.cin * g.kernel[0] * g.kernel[1] <= 128


def _accumulate(tap, n_rows: int, w, b, g: TileGeometry,
                activation: Optional[str], compute_dtype):
    """The ONE shifted/im2col accumulation epilogue shared by conv_tiles
    and dense_conv_shifted: fp32 accumulate, (dy, dx) visit order, bias,
    relu. Sharing it makes the overflow fallback's value-exactness
    structural — a divergence between the tile path and the dense
    fallback silently breaks the lax.cond bit-alignment contract
    (module doc), the class of bug the tuner/runtime gate split hit once
    (commit 2b3f121)."""
    kh, kw = g.kernel
    cout = w.shape[-1]
    if use_im2col(g):
        # one K=cin*k^2 matmul: k^2 separate K=cin matmuls re-walk the
        # fp32 accumulator k^2 times and starve the MXU (use_im2col doc)
        patches = jnp.concatenate(
            [tap(dy, dx) for dy in range(kh) for dx in range(kw)],
            axis=-1).reshape(n_rows, kh * kw * g.cin)
        acc = jnp.dot(patches,
                      w.astype(compute_dtype).reshape(kh * kw * g.cin, cout),
                      preferred_element_type=jnp.float32)
    else:
        acc = jnp.zeros((n_rows, cout), jnp.float32)
        for dy in range(kh):
            for dx in range(kw):
                patch = tap(dy, dx).reshape(n_rows, g.cin)
                acc += jnp.dot(patch, w[dy, dx].astype(compute_dtype),
                               preferred_element_type=jnp.float32)
    if b is not None:
        acc += b.astype(jnp.float32)
    if activation == "relu":
        acc = jnp.maximum(acc, 0.0)
    return acc


def conv_tiles(windows: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray],
               g: TileGeometry, activation: Optional[str],
               compute_dtype=jnp.float32) -> jnp.ndarray:
    """C5: batched tile conv as k^2 shifted MXU matmuls (or ONE im2col
    matmul for small-cin layers — see use_im2col).

    windows: (cap, win_h, win_w, cin) -> (cap, th, tw, cout).
    Accumulates in fp32 regardless of compute dtype.
    """
    sh, sw = g.stride
    dh, dw = g.dilation
    cap = windows.shape[0]
    wd = windows.astype(compute_dtype)

    def tap(dy, dx):
        return lax.slice(
            wd,
            (0, dy * dh, dx * dw, 0),
            (cap, dy * dh + (g.th - 1) * sh + 1,
             dx * dw + (g.tw - 1) * sw + 1, g.cin),
            (1, sh, sw, 1),
        )

    acc = _accumulate(tap, cap * g.th * g.tw, w, b, g, activation,
                      compute_dtype)
    return acc.reshape(cap, g.th, g.tw, w.shape[-1])


def scatter_tiles(out_cache: jnp.ndarray, idx: jnp.ndarray,
                  y_tiles: jnp.ndarray, g: TileGeometry) -> jnp.ndarray:
    """C6: write computed tiles into the cached output map.

    The output map is viewed tile-major (n_tiles, th, tw, c); sentinel ids
    index one past the end and are dropped (mode='drop').
    """
    c = out_cache.shape[-1]
    # (out_h_pad, out_w_pad, c) -> (tiles_h, th, tiles_w, tw, c) is a pure
    # row-major reshape (bitcast, no data movement), so the scatter can
    # update the donated cache buffer IN PLACE — the previous tile-major
    # form needed two full-map transposes per frame (~4x the map's bytes).
    tiled = out_cache.reshape(g.tiles_h, g.th, g.tiles_w, g.tw, c)
    ti = idx // g.tiles_w  # sentinel (n_tiles) -> ti == tiles_h: dropped
    tj = idx % g.tiles_w
    tiled = tiled.at[ti, :, tj].set(y_tiles.astype(out_cache.dtype),
                                    mode="drop")
    return tiled.reshape(out_cache.shape)


def delta_conv_jnp(xp: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray,
                   b: Optional[jnp.ndarray], out_cache: jnp.ndarray,
                   g: TileGeometry, activation: Optional[str],
                   compute_dtype=jnp.float32) -> jnp.ndarray:
    """Fused C4+C5+C6, jnp backend: returns the updated output cache."""
    windows = gather_windows(xp, idx, g)
    y_tiles = conv_tiles(windows, w, b, g, activation, compute_dtype)
    return scatter_tiles(out_cache, idx, y_tiles, g)


def dense_conv_shifted(storage: jnp.ndarray, w: jnp.ndarray,
                       b: Optional[jnp.ndarray], g: TileGeometry,
                       activation: Optional[str],
                       compute_dtype=jnp.float32) -> jnp.ndarray:
    """Full-map conv over the padded storage with the tile path's exact
    accumulation order.

    Used for the capacity-overflow dense fallback and the 'dense_cached'
    layer mode; value-exact vs the tile path because fp32 accumulation
    visits (dy, dx) in the same order over the same cin contractions.
    """
    sh, sw = g.stride
    dh, dw = g.dilation
    xd = storage.astype(compute_dtype)

    def tap(dy, dx):
        return lax.slice(
            xd,
            (dy * dh, g.dx0 + dx * dw, 0),
            (dy * dh + (g.out_h_pad - 1) * sh + 1,
             g.dx0 + dx * dw + (g.out_w_pad - 1) * sw + 1, g.cin),
            (sh, sw, 1),
        )

    acc = _accumulate(tap, g.out_h_pad * g.out_w_pad, w, b, g, activation,
                      compute_dtype)
    return acc.reshape(g.out_h_pad, g.out_w_pad, w.shape[-1])
