"""Shared Pallas kernel helpers."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def phase_slice(win, dy: int, dx: int, th: int, tw: int, sh: int, sw: int):
    """Extract the (dy, dx) convolution/pooling phase from a gathered input
    window WITHOUT strided vector slices (Mosaic only supports stride 1):
    contiguous slice + reshape-split on the leading (rows) and sublane
    (cols) dims, both verified supported on TPU.

    win: (>= dy + th*sh, >= dx + tw*sw, C) -> (th, tw, C)
    """
    C = win.shape[-1]
    r = lax.slice(win, (dy, 0, 0), (dy + th * sh, win.shape[1], C))
    if sh > 1:
        r = r.reshape(th, sh, win.shape[1], C)[:, 0]
    c = lax.slice(r, (0, dx, 0), (th, dx + tw * sw, C))
    if sw > 1:
        c = c.reshape(th, tw, sw, C)[:, :, 0]
    return c


def hint_origin(t, hint_tiles_w: int, H: int, hint: int = 8):
    """Decode a flat hint-tile id into its clamped logical pixel origin.

    Shared by the hint-driven kernels (detect._sparse_kernel,
    accept._accept_kernel): the H edge clamps to ``H - hint`` (overlapping
    reads/writes are idempotent per pixel); W needs no clamp because the
    callers assert ``W % hint == 0``. Returns (oy, ox, hi).
    """
    hi = t // hint_tiles_w
    hj = t - hi * hint_tiles_w
    oy = jnp.minimum(hi * hint, H - hint)
    return oy, hj * hint, hi
