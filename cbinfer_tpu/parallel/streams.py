"""Stream-parallel batched video pipeline (SURVEY.md C14 multi-stream,
configs[4] of BASELINE.json).

Multiple independent camera streams shard over a 1D device mesh
('stream'): parameters replicate; per-stream caches shard with their
streams, so each chip holds only its streams' state and no collective
traffic crosses ICI during a frame. This is the TPU-native replacement for
running N copies of the single-GPU reference — one XLA program, N streams,
K chips.

Streams beyond the device count run as SEQUENTIAL WAVES of one-stream-
per-device dispatches, never stacked into one program: the CB kernels'
count-bounded tile loops do not batch under vmap (r2: 0.35x of
back-to-back on one chip), and a lax.map over stacked local streams hits
the same cliff from the other side (r3: 0.37x — the (S_local, ...)
stacked scan carry re-slices and re-writes every full cache per step).
One stream per device per dispatch keeps every kernel invocation in its
single-stream steady state, so per-chip throughput matches sequential BY
CONSTRUCTION and cross-device scaling is linear (no collectives).

Tested on a virtual 8-device CPU mesh (tests/conftest.py); the driver's
dryrun_multichip exercises the same path.
"""

from __future__ import annotations

import functools

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..convert import CBNet


@functools.partial(jax.jit, static_argnames="axis")
def _cat(xs, axis):
    """Module-level jitted concat: one dispatch-cache entry per (shapes,
    axis), NOT one retrace per _gather_waves call (a fresh jax.jit wrapper
    per call discards the dispatch cache)."""
    return jnp.concatenate(xs, axis=axis)


@functools.partial(jax.jit, static_argnames="axis")
def _stack(xs, axis):
    """Jitted stack, same rationale as _cat: an EAGER stack of scan
    outputs fails TPU backend compilation with INVALID_ARGUMENT (the
    while-loop outputs carry non-default layouts); under jit XLA inserts
    the layout normalization itself."""
    return jnp.stack(xs, axis=axis)


def make_stream_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("stream",))


def shard_streams(mesh: Mesh, tree, batched: bool = True):
    """Place a pytree: batched leaves shard on axis 0, scalars replicate."""
    spec = P("stream") if batched else P()
    return jax.device_put(tree, NamedSharding(mesh, spec))


class MultiStreamRunner:
    """Batched multi-stream CB inference over a device mesh.

    Usage:
        runner = MultiStreamRunner(net, params, n_streams=8, mesh=mesh)
        ys, stats = runner.step(frames)       # frames: (S, H, W, C)
        ys, stats = runner.run_clip(clips)    # clips: (S, T, H, W, C)
    """

    def __init__(self, net: CBNet, params, n_streams: int,
                 mesh: Optional[Mesh] = None, thresholds=None,
                 out_map=None, collect_stats=True,
                 gather_outputs: bool = True):
        """``thresholds``/``out_map``/``collect_stats`` mirror
        runner.scan_video: deployment loops should pass the uint8-argmax
        ``out_map`` and ``collect_stats="mean"`` — stacking raw bf16
        logits over (S, T) pays the 16× lane-pad write per stream and the
        per-frame (T,) counter stacks pay ~77 us/frame of serialized
        copies (scan_video doc), neither of which a class-map consumer
        needs.

        ``gather_outputs=False`` returns step/run_clip outputs as a LIST
        of per-dispatch arrays (one per stream at D=1; one (D, ...) array
        per wave on a mesh) instead of stacking/concatenating them into
        one (S, ...) array. The gather is pure output cosmetics — a
        deployment consumer reads streams individually anyway — and its
        cost is real: at 720p x 4 streams x 32 frames the uint8 class-map
        stack alone copies ~118 MB per run_clip, the measured ~2% wave
        overhead vs the (list-form) sequential baseline (VERDICT r4 weak
        #5). With it off, the wave path's output form matches the
        sequential baseline's and per-chip throughput is equal by
        construction."""
        self.net = net
        self.thresholds = thresholds
        self.out_map = out_map
        self.collect_stats = collect_stats
        self.gather_outputs = gather_outputs
        self.n_streams = n_streams
        self.mesh = mesh or make_stream_mesh()
        D = self.mesh.devices.size
        if n_streams % D:
            raise ValueError(
                f"n_streams={n_streams} must divide over {D} devices")
        # WAVES: at most ONE stream resident per device per dispatch.
        # Streams beyond the device count run as additional sequential
        # dispatches (waves), NOT stacked into one program: both stacking
        # forms measured ~0.35x of back-to-back on one chip (r2: vmap —
        # the count-bounded kernels do not batch; r3: lax.map — the
        # stacked (S_local, ...) scan carry re-slices/DUSes every full
        # cache per step). One stream per device per dispatch keeps each
        # kernel invocation in the single-stream steady state, so per-chip
        # throughput matches sequential BY CONSTRUCTION and cross-chip
        # scaling stays linear (zero intra-frame collectives).
        self.n_waves = n_streams // D
        self._D = D

        if D == 1:
            # Single-device: bypass shard_map entirely — one PLAIN jitted
            # single-stream program per dispatch (the exact sequential
            # fast path; per-stream donated states). Besides being
            # sequential-equivalent by construction, this sidesteps an
            # intermittent INVALID_ARGUMENT the axon-tunneled TPU runtime
            # raises for mesh-compiled executables (r3; the same program
            # ran clean on some attempts — environmental, not semantic).
            from ..runner import scan_video
            self.params = params
            self.states = [net.init_state() for _ in range(n_streams)]

            def plain_step(p, st, f):
                y, st, s = net.apply(p, st, f, thresholds)
                return (out_map(y) if out_map is not None else y), st, \
                    (s if collect_stats else [])

            self._plain_step = jax.jit(plain_step, donate_argnums=(1,))
            self._plain_scan = jax.jit(
                lambda p, st, c: scan_video(net, p, c, state=st,
                                            thresholds=thresholds,
                                            out_map=out_map,
                                            collect_stats=collect_stats),
                donate_argnums=(1,))
            return

        replicated = NamedSharding(self.mesh, P())
        self._sharded = NamedSharding(self.mesh, P("stream"))
        self.params = jax.device_put(params, replicated)

        state1 = net.init_state()
        wave_state = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (D,) + a.shape), state1)
        self.states = [jax.device_put(wave_state, self._sharded)
                       for _ in range(self.n_waves)]

        def apply1(params, st, x):
            y, st, s = net.apply(params, st, x, thresholds)
            return (out_map(y) if out_map is not None else y), st, \
                (s if collect_stats else [])

        def streams_step(params, state, frames):
            return lax.map(lambda a: apply1(params, a[0], a[1]),
                           (state, frames))

        smap_step = jax.shard_map(
            streams_step, mesh=self.mesh,
            in_specs=(P(), P("stream"), P("stream")),
            out_specs=(P("stream"), P("stream"), P("stream")),
            check_vma=False)
        self._step = jax.jit(
            smap_step,
            in_shardings=(replicated, self._sharded, self._sharded),
            out_shardings=(self._sharded, self._sharded, self._sharded),
            donate_argnums=(1,),
        )

        from ..runner import scan_video

        def scan_clips(params, state, clips):
            # one stream per device inside shard_map (waves doc): strip
            # the S_local=1 axis, run the CANONICAL scan_video (same
            # out_map / collect_stats / thresholds semantics as every
            # other driver), restore the axis for the stream out_specs
            st1 = jax.tree.map(lambda a: a[0], state)
            ys, final, stats = scan_video(
                net, params, clips[0], state=st1, thresholds=thresholds,
                out_map=out_map, collect_stats=collect_stats)
            final = jax.tree.map(lambda a: a[None], final)
            # stats leaves: (T,) stacked -> (T, 1) time-major; "mean"
            # 0-dim scalars -> (1,); False -> empty tree
            ax = 0 if collect_stats == "mean" else 1
            stats = jax.tree.map(
                lambda a: jnp.expand_dims(jnp.asarray(a), ax), stats)
            return ys[None], final, stats

        stats_sharding = NamedSharding(
            self.mesh, P("stream") if collect_stats == "mean"
            else P(None, "stream"))
        smap_scan = jax.shard_map(
            scan_clips, mesh=self.mesh,
            in_specs=(P(), P("stream"), P("stream")),
            out_specs=(P("stream"), P("stream"),
                       P("stream") if collect_stats == "mean"
                       else P(None, "stream")),
            check_vma=False)
        self._scan = jax.jit(
            smap_scan,
            in_shardings=(replicated, self._sharded, self._sharded),
            out_shardings=(self._sharded, self._sharded, stats_sharding),
            donate_argnums=(1,),
        )

    def reset(self):
        if self._D == 1:
            self.states = [self.net.init_state()
                           for _ in range(self.n_streams)]
            return
        state1 = self.net.init_state()
        wave_state = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (self._D,) + a.shape), state1)
        self.states = [jax.device_put(wave_state, self._sharded)
                       for _ in range(self.n_waves)]

    def step(self, frames: jnp.ndarray):
        """One frame per stream: (S, H, W, C) -> ((S, ...), stats)."""
        frames = jnp.asarray(frames)
        if self._D == 1:
            outs = []
            for s_ in range(self.n_streams):
                y, self.states[s_], st = self._plain_step(
                    self.params, self.states[s_], frames[s_])
                outs.append((y, st))
            if not self.gather_outputs:
                return [o[0] for o in outs], [o[1] for o in outs]
            y = _stack([o[0] for o in outs], 0)
            st = jax.tree.map(lambda *xs: _stack(list(xs), 0),
                              *[o[1] for o in outs])
            return y, st
        ys, stats = [], []
        for w in range(self.n_waves):
            fw = jax.device_put(frames[w * self._D:(w + 1) * self._D],
                                self._sharded)
            y, self.states[w], st = self._step(self.params, self.states[w],
                                               fw)
            ys.append(y)
            stats.append(st)
        if not self.gather_outputs:
            return ys, stats
        return self._gather_waves(ys, stats, axis=0)

    def run_clip(self, clips: jnp.ndarray):
        """(S, T, H, W, C) -> ((S, T, ...), stats with (T, S) leaves)."""
        clips = jnp.asarray(clips)
        if self._D == 1:
            outs = []
            for s_ in range(self.n_streams):
                ys, self.states[s_], st = self._plain_scan(
                    self.params, self.states[s_], clips[s_])
                outs.append((ys, st))
            if not self.gather_outputs:
                return [o[0] for o in outs], [o[1] for o in outs]
            # jitted stack (see _stack): eager stack of scan outputs
            # trips the TPU non-default-layout INVALID_ARGUMENT
            y = _stack([o[0] for o in outs], 0)
            # stats leaves: (T,) stacked -> streams on axis 1 (time-major
            # convention); "mean" 0-dim scalars -> axis 0; False -> empty
            ax = 0 if self.collect_stats == "mean" else 1
            st = jax.tree.map(lambda *xs: _stack(list(xs), ax),
                              *[o[1] for o in outs])
            return y, st
        ys, stats = [], []
        for w in range(self.n_waves):
            cw = jax.device_put(clips[w * self._D:(w + 1) * self._D],
                                self._sharded)
            y, self.states[w], st = self._scan(self.params, self.states[w],
                                               cw)
            ys.append(y)
            stats.append(st)
        if not self.gather_outputs:
            return ys, stats
        return self._gather_waves(
            ys, stats, axis=0 if self.collect_stats == "mean" else 1)

    def _gather_waves(self, ys, stats, axis: int):
        """Concatenate per-wave outputs (stream axis 0; scan stats carry
        streams on axis 1). Jitted: an EAGER concatenate of the scan
        programs' outputs fails TPU backend compilation with
        INVALID_ARGUMENT (the while-loop outputs carry non-default
        layouts the eager concat refuses); under jit XLA inserts the
        layout normalization itself."""
        if self.n_waves == 1:
            return ys[0], stats[0]
        return _cat(ys, 0), jax.tree.map(lambda *xs: _cat(xs, axis), *stats)
