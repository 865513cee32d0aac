"""Profiling / observability (SURVEY.md C20, §5.1).

The reference instruments its pipeline stages with CUDA events and reports
per-stage timing breakdowns (arXiv 1704.04313 §4). TPU-native equivalents:

* ``trace(logdir)``: context manager around ``jax.profiler`` — produces an
  Xprof/TensorBoard trace in which the Pallas kernels appear as named
  custom calls (delta conv, sparse detect, pool).
* always-on counters: every CB layer already returns per-frame
  changed/computed/detect tile counts through the stats channel (free —
  they are byproducts of compaction); ``summarize_stats`` renders them.
* ``stage_timer``: coarse host-side wall-clock section timing for scripts.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "/tmp/cbinfer_trace"):
    """jax.profiler trace context (view with TensorBoard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def stage_timer(record: Dict[str, float], name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        record[name] = record.get(name, 0.0) + time.perf_counter() - t0


def summarize_stats(stats: List[Dict], specs=None) -> str:
    """Human-readable per-layer table from a scan's stats channel."""
    lines = ["layer | kind      | mean computed | max | overflow% | "
             "mean detect"]
    for i, s in enumerate(stats):
        if not s:
            kind = type(specs[i]).__name__ if specs else "dense"
            lines.append(f"{i:5d} | {kind:<9} |      --       |  -- |"
                         "    --     |    --")
            continue
        computed = np.asarray(s["computed_tiles"], np.float64)
        n = float(np.max(np.asarray(s["n_tiles"])))
        ov = float(np.mean(np.asarray(s["overflow"]))) * 100
        det = float(np.mean(np.asarray(s["detect_tiles"])))
        kind = type(specs[i]).__name__ if specs else "cb"
        lines.append(
            f"{i:5d} | {kind:<9} | {np.mean(computed)/n:12.1%} |"
            f" {np.max(computed)/n:3.0%} | {ov:8.1f}% | {det:8.1f}")
    return "\n".join(lines)
