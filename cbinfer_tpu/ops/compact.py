"""Stage C3: change-indexes extraction (stream compaction).

The reference uses cub/thrust GPU prefix-sum compaction (arXiv 1704.04313
§3.2; SURVEY.md C3 — library code, not hand CUDA). The XLA-honest equivalent
is a cumsum-based scatter into a FIXED-CAPACITY index buffer: dynamic result
counts are hostile to XLA's static-shape compilation model, so the buffer
holds ``capacity`` slots, padded with an out-of-range sentinel, plus the true
count m. Overflow (m > capacity) is reported so the layer can take a dense
fallback branch (value-exact — see layers.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Compacted(NamedTuple):
    idx: jnp.ndarray       # (capacity,) int32 flat tile ids; sentinel = n_tiles
    count: jnp.ndarray     # () int32: true number of changed tiles m
    overflow: jnp.ndarray  # () bool: m > capacity


def compact_mask(mask: jnp.ndarray, capacity: int) -> Compacted:
    """Boolean tile mask -> dense (padded) list of changed flat tile indices.

    Padded/overflowed entries hold the sentinel ``n_tiles`` (one past the
    last valid id) so downstream scatter drops them with mode='drop'.
    """
    n_tiles = mask.size
    flat = mask.reshape(-1)
    if mask.ndim == 2:
        # 2D masks (the tile grids every layer passes): per-row lane-dim
        # cumsum + a tiny row-offset cumsum instead of one long 1D cumsum —
        # identical row-major positions, 8x faster on TPU (measured r3:
        # 0.32 vs 2.64 us/op on a (90,160) mask; the 1D T(1024) cumsum
        # chain is latency-bound)
        m = mask.astype(jnp.int32)
        row = jnp.cumsum(m, axis=1)
        tot = row[:, -1]
        offs = jnp.cumsum(tot) - tot
        pos = (row - 1 + offs[:, None]).reshape(-1)
        count = jnp.sum(tot, dtype=jnp.int32)
    else:
        count = jnp.sum(flat, dtype=jnp.int32)
        # position of each changed tile in the compacted buffer
        pos = jnp.cumsum(flat, dtype=jnp.int32) - 1
    # scatter tile ids to their positions; unchanged tiles target `capacity`
    # (dropped), positions >= capacity (overflow) are dropped too.
    target = jnp.where(flat, pos, capacity)
    idx = jnp.full((capacity,), n_tiles, dtype=jnp.int32)
    idx = idx.at[target].set(jnp.arange(n_tiles, dtype=jnp.int32), mode="drop")
    return Compacted(idx=idx, count=count, overflow=count > capacity)
