"""Streaming video runner (SURVEY.md C14, configs[4] of BASELINE.json).

The reference loops over decoded frames in Python, launching ~5 CUDA kernels
per layer per frame ([repo-recall]). TPU-native: the whole video is a single
``lax.scan`` over the frame axis with the per-layer caches as a DONATED
carry — zero host round-trips per frame, O(1) memory in video length
(SURVEY.md §5.7: temporal streaming is this framework's "long-context"
story). Multi-stream batching stacks an outer vmap; sharding over a device
mesh lives in parallel/streams.py.

For live sources (frames arriving one at a time) use ``FrameStepper``, which
jits a single donated-carry step.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .convert import CBNet


def scan_video(net: CBNet, params, frames: jnp.ndarray,
               state: Optional[List] = None, collect_stats: bool = True,
               thresholds: Optional[jnp.ndarray] = None, unroll: int = 1,
               refresh_every: Optional[int] = None, frame_offset=0,
               refresh_start: bool = False, out_map=None):
    """Run a (T, H, W, C) clip through the CB net as one scan.

    Returns (outputs (T, ...), final_state, stats) where stats is a per-layer
    dict of (T,)-shaped counters (changed/computed tiles, overflow) — the
    always-on observability channel (SURVEY.md §5.1). ``thresholds`` is the
    optional runtime tau vector (see CBNet.apply).

    ``refresh_every=K`` forces a full recompute whenever
    (frame_offset + t) % K == 0: the accepted-value rule lets each cache
    drift up to tau from the exactly-computed value indefinitely, and a
    periodic refresh bounds the WORST-CASE staleness of any cache entry to
    K frames at the cost of one dense-equivalent frame per K. The refresh
    frame runs net.apply_refresh (dense XLA convs writing the caches
    directly) in a lax.cond — a full-map frame through the sparse CB
    kernels' count-bounded tile loops costs several times the dense conv.
    The reference has no equivalent (its streams were evaluated over short
    clips); this is the production knob for unbounded streams.
    ``frame_offset`` (static or traced scalar) keeps the refresh phase
    aligned across successive scan_video calls on one stream.

    ``refresh_start=True`` is the COND-FREE refresh mode for chunked
    streaming: frame 0 of THIS scan runs apply_refresh as a static prolog
    and the remaining frames scan without any per-frame branch. Calling it
    once per K-frame chunk is semantically identical to
    ``refresh_every=K`` with chunk-aligned offsets, but avoids the
    per-refresh-frame cost of lax.cond on a multi-GB carry (XLA cannot
    alias the donated caches into both branches; measured ~6-11 ms per
    refresh frame via cond vs ~4 ms as a prolog).

    ``out_map`` (optional callable) transforms each frame's output BEFORE
    the scan stacks it — e.g. ``argmax(..., -1).astype(uint8)`` for a
    deployment loop that consumes class maps: an 8-channel bf16 logits
    frame is lane-padded 16x by TPU layouts when stacked over T, so
    stacking the uint8 class map instead cuts the per-frame output write
    ~30x (the same argmax-transparency argument the seg harness documents
    for its in-loop argmax-then-upsample).
    """
    if state is None:
        state = net.init_state()

    def step(carry, xt):
        t, x = xt
        if refresh_every is not None:
            y, new_carry, stats = lax.cond(
                (t % refresh_every) == 0,
                lambda c, xi: net.apply_refresh(params, c, xi, thresholds),
                lambda c, xi: net.apply(params, c, xi, thresholds),
                carry, x)
        else:
            y, new_carry, stats = net.apply(params, carry, x, thresholds)
        if out_map is not None:
            y = out_map(y)
        if not collect_stats:
            stats = []
        return new_carry, (y, stats)

    t0 = frames.shape[0] - frames.shape[0]  # 0, shape-polymorphism-safe
    if refresh_start:
        assert refresh_every is None, \
            "refresh_start replaces refresh_every; use one"
        if frames.shape[0] == 0:
            # a chunked driver's final chunk can be empty; frames[0]
            # below would be an opaque trace-time OOB error
            raise ValueError("scan_video(refresh_start=True) needs at "
                             "least one frame (got an empty clip)")
        y0, state, stats0 = net.apply_refresh(params, state, frames[0],
                                              thresholds)
        if out_map is not None:
            y0 = out_map(y0)
        if not collect_stats:
            stats0 = []
        frames = frames[1:]
        t0 = 1

    ts = frame_offset + t0 + jnp.arange(frames.shape[0], dtype=jnp.int32)
    final_state, (ys, stats) = lax.scan(step, state, (ts, frames),
                                        unroll=unroll)
    if refresh_start:
        ys = jnp.concatenate([y0[None], ys])
        stats = jax.tree.map(
            lambda a, b: jnp.concatenate([jnp.asarray(a)[None],
                                          jnp.asarray(b)]), stats0, stats)
    return ys, final_state, stats


def scan_video_jit(net: CBNet):
    """Jitted scan_video with donated state (caches updated in place)."""
    return jax.jit(
        lambda params, frames, state: scan_video(net, params, frames, state),
        donate_argnums=(2,))


class FrameStepper:
    """Single-frame streaming interface with donated carry (live sources).

    The deployment twin of ``scan_video`` for frames that arrive one at a
    time (camera, socket): same operating-point knobs — runtime
    ``thresholds``, the periodic dense refresh that bounds cache drift on
    unbounded streams (here a host-side dispatch choice between two
    compiled executables, mirroring the chunked drivers' refresh_start
    prolog: a lax.cond on the multi-GB carry costs 6-11 ms/frame), and
    ``out_map`` for deployment output forms (e.g. uint8 argmax maps).
    Works with both sequential ``CBNet`` and DAG ``CBGraphNet`` (identical
    apply/apply_refresh contracts). Frame 0 always runs the refresh/cold
    executable — it is the dense cold start that populates the caches.
    """

    def __init__(self, net, params, thresholds=None,
                 refresh_every: Optional[int] = None, out_map=None):
        self._net = net
        self._params = params
        self._state = net.init_state()
        self._tv = (None if thresholds is None
                    else jnp.asarray(thresholds, jnp.float32))
        self._refresh_every = refresh_every
        self._t = 0

        def wrap(apply_fn):
            def fn(p, st, x, tv):
                y, st2, stats = apply_fn(p, st, x, tv)
                if out_map is not None:
                    y = out_map(y)
                return y, st2, stats
            return jax.jit(fn, donate_argnums=(1,))

        self._step = wrap(net.apply)
        self._cold = wrap(net.apply_refresh)

    def reset(self):
        self._state = self._net.init_state()
        self._t = 0

    def __call__(self, frame) -> Tuple[jnp.ndarray, List[Dict[str, Any]]]:
        refresh = self._t == 0 or (self._refresh_every is not None
                                   and self._t % self._refresh_every == 0)
        fn = self._cold if refresh else self._step
        y, self._state, stats = fn(self._params, self._state,
                                   jnp.asarray(frame), self._tv)
        self._t += 1
        return y, stats
