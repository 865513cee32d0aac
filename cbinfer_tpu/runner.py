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
               refresh_start: bool = False, out_map=None,
               ingest: bool = False):
    """Run a (T, H, W, C) clip through the CB net as one scan.

    Returns (outputs (T, ...), final_state, stats) where stats is a per-layer
    dict of counters (changed/computed tiles, overflow) — (T,)-stacked by
    default, 0-dim float32 means under ``collect_stats="mean"`` — the
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

    ``collect_stats`` selects the observability form: ``True`` stacks
    every per-layer counter into a (T,) array (full per-frame trail);
    ``"mean"`` accumulates the same counters as float32 MEANS in the scan
    carry and returns a tree of 0-dim scalars — the deployment form: the
    per-frame (T,) counter stacks are dynamic-update-sliced through the
    scan's HBM outputs each iteration, which xprof measured at ~77
    us/frame on 720p scene (an s32[T] copy pair serialized in the while
    body), while carry-resident scalar adds ride SMEM for free.
    ``effective_flops`` accepts both forms unchanged (it only consumes
    means/maxes). ``False`` drops stats entirely.

    ``ingest=True`` asks the net for its clip-resident input form
    (CBNet.make_ingest): the chunk is pre-shaped ONCE outside the scan
    and the scan body passes the stem a frame INDEX into the HBM-resident
    clip instead of a sliced frame — the fused patch_stem detect kernel
    DMAs its bands directly (numerics identical; nets without the form
    silently fall back to the classic per-frame slicing).
    """
    if state is None:
        state = net.init_state()
    mean_stats = collect_stats == "mean"
    wrap = (net.make_ingest(frames)
            if ingest and hasattr(net, "make_ingest") else None)

    def apply_t(carry, t, x):
        if refresh_every is not None:
            return lax.cond(
                (t % refresh_every) == 0,
                lambda c, xi: net.apply_refresh(params, c, xi, thresholds),
                lambda c, xi: net.apply(params, c, xi, thresholds),
                carry, x)
        return net.apply(params, carry, x, thresholds)

    def step(carry, xt):
        t, x = xt
        if wrap is not None:
            x = wrap(x)  # x is the frame INDEX into the resident clip
        if mean_stats:
            carry, acc = carry
        y, new_carry, stats = apply_t(carry, t, x)
        if out_map is not None:
            y = out_map(y)
        if mean_stats:
            acc = jax.tree.map(
                lambda a, s: a + jnp.asarray(s, jnp.float32), acc, stats)
            return (new_carry, acc), (y, ())
        if not collect_stats:
            stats = []
        return new_carry, (y, stats)

    t0 = frames.shape[0] - frames.shape[0]  # 0, shape-polymorphism-safe
    n_total = frames.shape[0]
    stats0 = None
    if refresh_start:
        assert refresh_every is None, \
            "refresh_start replaces refresh_every; use one"
        if frames.shape[0] == 0:
            # a chunked driver's final chunk can be empty; frames[0]
            # below would be an opaque trace-time OOB error
            raise ValueError("scan_video(refresh_start=True) needs at "
                             "least one frame (got an empty clip)")
        x0 = wrap(0) if wrap is not None else frames[0]
        y0, state, stats0 = net.apply_refresh(params, state, x0,
                                              thresholds)
        if out_map is not None:
            y0 = out_map(y0)
        if not collect_stats:
            stats0 = []
        if wrap is None:
            frames = frames[1:]
        t0 = 1

    n_scan = n_total - t0
    ts = frame_offset + t0 + jnp.arange(n_scan, dtype=jnp.int32)
    # classic path: xs slices the clip per frame; ingest path: xs is just
    # the frame index (the clip stays a loop-invariant HBM closure)
    if wrap is not None:
        xs = (ts, t0 + jnp.arange(n_scan, dtype=jnp.int32))
    else:
        xs = (ts, frames)
    if mean_stats:
        # accumulator tree from an ABSTRACT eval of one step (no compile,
        # no FLOPs); seeded with the prolog's stats when there is one
        if stats0 is not None:
            acc0 = jax.tree.map(lambda s: jnp.asarray(s, jnp.float32),
                                stats0)
        else:
            shapes = jax.eval_shape(
                lambda c, x: apply_t(c, jnp.int32(t0), x)[2], state,
                wrap(jnp.int32(t0)) if wrap is not None
                else (frames[0] if frames.shape[0] else None))
            acc0 = jax.tree.map(
                lambda s: jnp.zeros(s.shape, jnp.float32), shapes)
        (final_state, acc), (ys, _) = lax.scan(
            step, (state, acc0), xs, unroll=unroll)
        stats = jax.tree.map(lambda a: a / max(1, n_total), acc)
    else:
        final_state, (ys, stats) = lax.scan(step, state, xs,
                                            unroll=unroll)
    if refresh_start:
        ys = jnp.concatenate([y0[None], ys])
        if collect_stats and not mean_stats:
            stats = jax.tree.map(
                lambda a, b: jnp.concatenate([jnp.asarray(a)[None],
                                              jnp.asarray(b)]),
                stats0, stats)
    return ys, final_state, stats


def scan_video_jit(net: CBNet):
    """Jitted scan_video with donated state (caches updated in place)."""
    return jax.jit(
        lambda params, frames, state: scan_video(net, params, frames, state),
        donate_argnums=(2,))


STAT_KEYS = ("changed_pixels", "changed_tiles", "computed_tiles",
             "detect_tiles", "n_tiles", "overflow")


def _stat_dicts(stats) -> List[Dict[str, Any]]:
    """Flatten either stats container (CBNet: list of per-layer dicts;
    CBGraphNet: dict keyed by node name, in insertion = topological
    order) into an ordered list of the non-empty counter dicts."""
    if isinstance(stats, dict):
        if "changed_tiles" in stats:
            return [stats]
        out: List[Dict[str, Any]] = []
        for v in stats.values():
            out.extend(_stat_dicts(v))
        return out
    if isinstance(stats, (list, tuple)):
        out = []
        for v in stats:
            out.extend(_stat_dicts(v))
        return out
    return []


def pack_stats(stats) -> jnp.ndarray:
    """Per-layer stats dicts -> ONE (n_cb_layers, 6) int32 array.

    Every scalar counter a CB layer reports (STAT_KEYS order; dense
    layers' empty dicts are skipped) becomes a row of a single device
    array. Rationale: on this tunneled runtime each dispatch OUTPUT
    buffer costs ~17 us of handoff (scripts/probe_stepper.py probe B) —
    a 28-CB-layer net returning 6 scalars per layer pays ~170 buffers
    ~= 2.9 ms per one-frame dispatch for observability the scan form
    gets for free in its carry. Packing keeps the counters at ONE
    buffer's cost. Works for both sequential and graph stats containers
    (_stat_dicts order: layer order / topological node order)."""
    rows = [jnp.stack([jnp.asarray(s[k], jnp.int32) for k in STAT_KEYS])
            for s in _stat_dicts(stats)]
    return jnp.stack(rows) if rows else jnp.zeros((0, 6), jnp.int32)


def unpack_stats(packed) -> List[Dict[str, Any]]:
    """Inverse of pack_stats (host side): (L, 6) array -> list of dicts."""
    import numpy as np
    arr = np.asarray(packed)
    return [{k: arr[i, j] for j, k in enumerate(STAT_KEYS)}
            for i in range(arr.shape[0])]


def _make_state_packer(state, threshold_bytes: int):
    """Pack small carry leaves into one flat arena per dtype.

    Returns (pack, unpack, n_packed): ``pack(state) -> (arenas, rest)``
    where ``arenas`` is a dict {dtype_name: 1-D array} holding every leaf
    whose byte size is <= threshold_bytes, and ``rest`` the big leaves
    unchanged; ``unpack`` inverts it inside the jitted step (static
    offsets -> plain slices). Motivation: per-dispatch handoff on this
    runtime costs ~17 us per CARRY BUFFER regardless of size
    (probe_stepper probe B), so a deep net's dozens of small deep-layer
    caches dominate the K=1 dispatch floor; concatenating them trades
    ~2x their bytes in HBM traffic (cheap for small leaves) for
    (n_packed - n_dtypes) fewer buffers per dispatch. Big caches stay
    separate: copying them would cost more than their handoff."""
    leaves, treedef = jax.tree.flatten(state)
    packed_ids = [i for i, l in enumerate(leaves)
                  if l.size * l.dtype.itemsize <= threshold_bytes]
    groups: Dict[str, list] = {}
    for i in packed_ids:
        groups.setdefault(leaves[i].dtype.name, []).append(i)
    offsets: Dict[int, Tuple[str, int, int]] = {}
    for dt, ids in groups.items():
        o = 0
        for i in ids:
            offsets[i] = (dt, o, leaves[i].size)
            o += leaves[i].size
    rest_ids = [i for i in range(len(leaves)) if i not in offsets]
    shapes = [(l.shape, l.dtype) for l in leaves]

    def pack(st):
        ls = jax.tree.leaves(st)
        arenas = {dt: jnp.concatenate([ls[i].reshape(-1) for i in ids])
                  for dt, ids in groups.items()}
        return arenas, [ls[i] for i in rest_ids]

    def unpack(arenas, rest):
        ls: List[Any] = [None] * len(shapes)
        for i, (dt, o, n) in offsets.items():
            ls[i] = arenas[dt][o:o + n].reshape(shapes[i][0])
        for j, i in enumerate(rest_ids):
            ls[i] = rest[j]
        return jax.tree.unflatten(treedef, ls)

    return pack, unpack, len(packed_ids)


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

    K=1 dispatch-floor knobs (this runtime pays ~0.2 ms launch + ~17 us
    PER dispatch argument/result buffer — probe_stepper probes A/B —
    which a deep net's state pytree and per-layer stats multiply):
      ``collect_stats``: False (DEFAULT — the deployment live form; on
        720p scene the per-frame stat outputs alone tripled the K=1
        dispatch cost, 1.99 -> 0.54 ms/frame, probe D) computes no
        stats; ``"packed"`` returns one (L, 6) int32 array per frame
        (see pack_stats; decode with unpack_stats); True returns the
        per-layer stat dicts (~6 output buffers per CB layer per frame
        — instrumentation, not deployment).
      ``pack_small_buffers``: byte threshold; carry leaves at or below
        it ride one per-dtype arena buffer between dispatches
        (_make_state_packer). 0 = off.
      ``bind_params``: close the params over the jitted step instead of
        passing ~dozens of weight-buffer handles per dispatch (weights
        are lowered as executable constants — fine for MB-scale nets).
    """

    def __init__(self, net, params, thresholds=None,
                 refresh_every: Optional[int] = None, out_map=None,
                 collect_stats: Any = False, pack_small_buffers: int = 0,
                 bind_params: bool = False):
        self._net = net
        self._params = params
        self._state = net.init_state()
        self._tv = (None if thresholds is None
                    else jnp.asarray(thresholds, jnp.float32))
        self._refresh_every = refresh_every
        self._t = 0
        self._since_refresh = 0
        self._out_map = out_map
        self._collect_stats = collect_stats
        if pack_small_buffers > 0:
            self._pack, self._unpack, self._n_packed = _make_state_packer(
                self._state, pack_small_buffers)
            self._state = self._pack(self._state)
        else:
            self._pack = self._unpack = None
            self._n_packed = 0

        def wrap(apply_fn):
            def body(p, st, x, tv):
                if self._unpack is not None:
                    st = self._unpack(*st)
                y, st2, stats = apply_fn(p, st, x, tv)
                if out_map is not None:
                    y = out_map(y)
                if self._pack is not None:
                    st2 = self._pack(st2)
                if collect_stats == "packed":
                    stats = pack_stats(stats)
                elif not collect_stats:
                    stats = []
                return y, st2, stats
            if bind_params:
                return jax.jit(lambda st, x, tv: body(params, st, x, tv),
                               donate_argnums=(0,))
            return jax.jit(body, donate_argnums=(1,))

        self._bind_params = bind_params
        self._step = wrap(net.apply)
        self._cold = wrap(net.apply_refresh)
        self._kstep: Dict[int, Any] = {}   # K -> (plain, refresh) jits

    def reset(self):
        self._state = self._net.init_state()
        if self._pack is not None:
            self._state = self._pack(self._state)
        self._t = 0
        self._since_refresh = 0

    def __call__(self, frame) -> Tuple[jnp.ndarray, List[Dict[str, Any]]]:
        # Refresh decisions key off _since_refresh (shared with
        # step_chunk) rather than _t % refresh_every, so mixing the two
        # entry points on one stream keeps the bounded-staleness
        # contract: no cache entry goes more than refresh_every frames
        # without a dense recompute regardless of call interleaving.
        refresh = self._t == 0 or (
            self._refresh_every is not None
            and self._since_refresh + 1 > self._refresh_every)
        fn = self._cold if refresh else self._step
        if self._bind_params:
            y, self._state, stats = fn(self._state, jnp.asarray(frame),
                                       self._tv)
        else:
            y, self._state, stats = fn(self._params, self._state,
                                       jnp.asarray(frame), self._tv)
        self._since_refresh = 1 if refresh else self._since_refresh + 1
        self._t += 1
        return y, stats

    def _k_executables(self, k: int):
        if k not in self._kstep:
            net, out_map = self._net, self._out_map

            def mk(refresh_start):
                def fn(p, fs, st, tv):
                    if self._unpack is not None:
                        st = self._unpack(*st)
                    ys, st2, stats = scan_video(
                        net, p, fs, state=st, thresholds=tv,
                        refresh_start=refresh_start, out_map=out_map,
                        collect_stats="mean")
                    if self._pack is not None:
                        st2 = self._pack(st2)
                    return ys, st2, stats
                return jax.jit(fn, donate_argnums=(2,))

            self._kstep[k] = (mk(False), mk(True))
        return self._kstep[k]

    def step_chunk(self, frames) -> Tuple[jnp.ndarray, Any]:
        """Micro-batched live stepping: ONE dispatch per K frames.

        ``frames`` is a (K, H, W, C) batch of consecutive frames;
        returns ((K, ...) outputs, mean-form stats). The per-dispatch
        overhead of the one-frame path (executable launch + donated-
        carry handoff, ~0.4 ms on this box — scripts/probe_stepper.py)
        amortizes over K, at the price of K-1 frames of added capture
        latency: the latency/throughput dial a deployment chooses per
        camera (K=4 at 30 fps adds 100 ms; K=1 is this class's
        ``__call__``). Refresh policy at chunk granularity: the dense
        refresh prolog runs on frame 0 of the first chunk (cold start)
        and of any chunk where ``refresh_every`` frames have elapsed
        since the last refresh — identical semantics to the chunked
        drivers' refresh_start prolog (scan_video doc).
        """
        frames = jnp.asarray(frames)
        k = int(frames.shape[0])
        plain, refreshing = self._k_executables(k)
        do_refresh = self._t == 0 or (
            self._refresh_every is not None
            and self._since_refresh + k > self._refresh_every)
        fn = refreshing if do_refresh else plain
        ys, self._state, stats = fn(self._params, frames, self._state,
                                    self._tv)
        self._since_refresh = k if do_refresh else self._since_refresh + k
        self._t += k
        return ys, stats
