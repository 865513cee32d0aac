"""Stream-parallel batched video pipeline (SURVEY.md C14 multi-stream,
configs[4] of BASELINE.json).

Multiple independent camera streams shard over a 1D device mesh
('stream'): parameters replicate; per-stream caches shard with their
streams, so each chip holds only its streams' state and no collective
traffic crosses ICI during a frame. This is the TPU-native replacement for
running N copies of the single-GPU reference — one XLA program, N streams,
K chips.

Within each device, local streams run SEQUENTIALLY via ``lax.map``
(shard_map over the mesh, lax.map over the local shard) rather than vmap:
the CB kernels' count-bounded serial tile loops do not batch under vmap —
a 4-stream vmap on one chip measured 0.35x the throughput of running the
streams back-to-back (r2 negative result; VERDICT r2 #5) — while lax.map
executes each stream's kernels exactly as the single-stream path does, so
per-device throughput matches sequential by construction and cross-device
scaling is linear (no collectives).

Tested on a virtual 8-device CPU mesh (tests/conftest.py); the driver's
dryrun_multichip exercises the same path.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..convert import CBNet


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
                 mesh: Optional[Mesh] = None):
        self.net = net
        self.n_streams = n_streams
        self.mesh = mesh or make_stream_mesh()
        if n_streams % self.mesh.devices.size:
            raise ValueError(
                f"n_streams={n_streams} must divide over "
                f"{self.mesh.devices.size} devices")

        replicated = NamedSharding(self.mesh, P())
        self._sharded = NamedSharding(self.mesh, P("stream"))
        self.params = jax.device_put(params, replicated)

        state1 = net.init_state()
        state = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (n_streams,) + a.shape), state1)
        self.state = jax.device_put(state, self._sharded)

        # Per-device execution: lax.map over the LOCAL streams (sequential
        # kernel invocations, single-stream-identical) inside a shard_map
        # over the mesh — NOT vmap (module doc: 0.35x cliff).
        def streams_step(params, state, frames):
            return lax.map(lambda a: net.apply(params, a[0], a[1]),
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

        def scan_clips(params, state, clips):
            # clips: (S_local, T, ...) -> time-major scan of stream-mapped
            # steps (runs inside shard_map on each device's shard)
            def body(carry, xt):
                y, new_carry, stats = lax.map(
                    lambda a: net.apply(params, a[0], a[1]), (carry, xt))
                return new_carry, (y, stats)

            final, (ys, stats) = lax.scan(body, state,
                                          jnp.swapaxes(clips, 0, 1))
            return jnp.swapaxes(ys, 0, 1), final, stats

        # stats leaves from the scan are time-major (T, S): shard dim 1
        stats_sharding = NamedSharding(self.mesh, P(None, "stream"))
        smap_scan = jax.shard_map(
            scan_clips, mesh=self.mesh,
            in_specs=(P(), P("stream"), P("stream")),
            out_specs=(P("stream"), P("stream"), P(None, "stream")),
            check_vma=False)
        self._scan = jax.jit(
            smap_scan,
            in_shardings=(replicated, self._sharded, self._sharded),
            out_shardings=(self._sharded, self._sharded, stats_sharding),
            donate_argnums=(1,),
        )

    def reset(self):
        state1 = self.net.init_state()
        state = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (self.n_streams,) + a.shape),
            state1)
        self.state = jax.device_put(state, self._sharded)

    def step(self, frames: jnp.ndarray):
        """One frame per stream: (S, H, W, C) -> ((S, ...), stats)."""
        frames = jax.device_put(jnp.asarray(frames), self._sharded)
        y, self.state, stats = self._step(self.params, self.state, frames)
        return y, stats

    def run_clip(self, clips: jnp.ndarray):
        """(S, T, H, W, C) -> ((S, T, ...), stats with (T, S) leaves)."""
        clips = jax.device_put(jnp.asarray(clips), self._sharded)
        ys, self.state, stats = self._scan(self.params, self.state, clips)
        return ys, stats
