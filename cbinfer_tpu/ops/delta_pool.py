"""Stage C7: change-based max pooling (jnp/XLA backend).

Reference: a dedicated CUDA kernel recomputing only pooling outputs whose
window saw a change (arXiv 1808.05488 §IV-F) — the piece that lets
change-based execution propagate through whole networks. Reuses the C1-C3/C6
machinery; the per-tile compute is a windowed max instead of a GEMM.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .delta_conv import gather_windows, scatter_tiles
from .geometry import TileGeometry


def pool_tiles(windows: jnp.ndarray, g: TileGeometry) -> jnp.ndarray:
    """(cap, win_h, win_w, c) -> (cap, th, tw, c) max-pool per tile."""
    kh, kw = g.kernel
    sh, sw = g.stride
    cap, _, _, c = windows.shape
    y = None
    for dy in range(kh):
        for dx in range(kw):
            patch = lax.slice(
                windows,
                (0, dy, dx, 0),
                (cap, dy + (g.th - 1) * sh + 1, dx + (g.tw - 1) * sw + 1, c),
                (1, sh, sw, 1))
            y = patch if y is None else jnp.maximum(y, patch)
    return y


def delta_pool_jnp(storage: jnp.ndarray, idx: jnp.ndarray,
                   out_cache: jnp.ndarray, g: TileGeometry) -> jnp.ndarray:
    """Fused gather + pool + scatter, jnp backend (reads padded storage)."""
    windows = gather_windows(storage, idx, g)
    y_tiles = pool_tiles(windows, g)
    return scatter_tiles(out_cache, idx, y_tiles, g)


def dense_pool(storage: jnp.ndarray, g: TileGeometry) -> jnp.ndarray:
    """Full-map max pool over the padded storage."""
    kh, kw = g.kernel
    sh, sw = g.stride
    y = None
    for dy in range(kh):
        for dx in range(kw):
            patch = lax.slice(
                storage,
                (dy, g.dx0 + dx, 0),
                (dy + (g.out_h_pad - 1) * sh + 1,
                 g.dx0 + dx + (g.out_w_pad - 1) * sw + 1, storage.shape[-1]),
                (sh, sw, 1))
            y = patch if y is None else jnp.maximum(y, patch)
    return y
