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

import jax
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
    count = jnp.sum(flat, dtype=jnp.int32)
    # SORT, not cumsum+scatter: changed tiles keep their ids as sort keys,
    # unchanged tiles get a beyond-range key, and an ascending lax.sort
    # packs the changed ids to the front in the same row-major order the
    # prefix-sum produced. TPU's vectorized sort runs this in 2.5 us on a
    # 14400-tile grid where the scatter lowering serializes at ~6 ns per
    # element (86 us/op, reproduced in-pipeline by xprof r3 — the scatter
    # fusions were the single largest glue cost of deep nets).
    big = jnp.int32(1) << 30  # > any n_tiles, < int32 max
    key = jnp.where(flat, jnp.arange(n_tiles, dtype=jnp.int32), big)
    srt = jax.lax.sort(key)[:capacity]
    idx = jnp.where(srt < big, srt, n_tiles)
    return Compacted(idx=idx, count=count, overflow=count > capacity)
