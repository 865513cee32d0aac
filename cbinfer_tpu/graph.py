"""DAG network IR with concatenation (SURVEY.md C17 fidelity).

The reference's OpenPose workload is not sequential: each refinement stage
consumes the BACKBONE features concatenated with the previous stage's two
branch outputs (arXiv 1808.05488 §VI; the original OpenPose architecture).
This module generalizes the sequential CBNet to a DAG: nodes reference
named predecessors; ``ConcatSpec`` merges along channels. CB layers behave
exactly as in layers.py — topology is pure plumbing — and dirty hints merge
at concat nodes (OR of input hints, same spatial grid).

A node's spec may be any sequential LayerSpec or ConcatSpec. The graph must
be topologically ordered (nodes only reference earlier nodes or "input").
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import layers as L
from . import network
from .config import ConvSpec, PipelineConfig, PoolSpec, UpsampleSpec
from .ops.geometry import conv_out_size, pad_dim


@dataclasses.dataclass(frozen=True)
class ConcatSpec:
    kind: str = "concat"


@dataclasses.dataclass(frozen=True)
class GraphNode:
    name: str
    spec: Any                       # LayerSpec | ConcatSpec
    inputs: Tuple[str, ...] = ("input",)

    def __post_init__(self):
        object.__setattr__(self, "inputs", tuple(self.inputs))


def node_out_shapes(nodes: Sequence[GraphNode],
                    in_shape: Tuple[int, int, int]
                    ) -> Dict[str, Tuple[int, int, int]]:
    shapes: Dict[str, Tuple[int, int, int]] = {"input": tuple(in_shape)}
    for n in nodes:
        ins = [shapes[i] for i in n.inputs]
        if isinstance(n.spec, ConcatSpec):
            h, w = ins[0][:2]
            assert all(s[:2] == (h, w) for s in ins), (n.name, ins)
            shapes[n.name] = (h, w, sum(s[2] for s in ins))
        elif isinstance(n.spec, ConvSpec):
            h, w, _ = ins[0]
            shapes[n.name] = (
                conv_out_size(h, n.spec.kernel[0], n.spec.stride[0],
                              n.spec.dilation[0], pad_dim(n.spec.padding, 0)),
                conv_out_size(w, n.spec.kernel[1], n.spec.stride[1],
                              n.spec.dilation[1], pad_dim(n.spec.padding, 1)),
                n.spec.features)
        elif isinstance(n.spec, PoolSpec):
            h, w, c = ins[0]
            shapes[n.name] = (
                conv_out_size(h, n.spec.window[0], n.spec.stride[0], 1,
                              pad_dim(n.spec.padding, 0)),
                conv_out_size(w, n.spec.window[1], n.spec.stride[1], 1,
                              pad_dim(n.spec.padding, 1)), c)
        elif isinstance(n.spec, UpsampleSpec):
            h, w, c = ins[0]
            shapes[n.name] = (h * n.spec.scale[0], w * n.spec.scale[1], c)
        else:
            raise TypeError(n.spec)
    return shapes


def init_graph_params(nodes: Sequence[GraphNode],
                      in_shape: Tuple[int, int, int], rng,
                      dtype=jnp.float32) -> Dict[str, Any]:
    import math
    import jax
    shapes = node_out_shapes(nodes, in_shape)
    params: Dict[str, Any] = {}
    for n in nodes:
        if isinstance(n.spec, ConvSpec):
            cin = shapes[n.inputs[0]][2]
            kh, kw = n.spec.kernel
            rng, k = jax.random.split(rng)
            fan_in = kh * kw * cin
            w = (jax.random.normal(k, (kh, kw, cin, n.spec.features), dtype)
                 * math.sqrt(2.0 / fan_in))
            b = (jnp.zeros((n.spec.features,), dtype)
                 if n.spec.use_bias else None)
            params[n.name] = (w, b)
    return params


@dataclasses.dataclass(frozen=True)
class CBGraphNet:
    """Change-based DAG network; same contract as convert.CBNet."""

    nodes: Tuple[GraphNode, ...]
    in_shape: Tuple[int, int, int]
    cfg: PipelineConfig
    output: str  # name of the output node

    def init_state(self) -> Dict[str, Optional[L.CBLayerState]]:
        shapes = node_out_shapes(self.nodes, self.in_shape)
        state: Dict[str, Optional[L.CBLayerState]] = {}
        for n in self.nodes:
            is_cb = (isinstance(n.spec, (ConvSpec, PoolSpec))
                     and n.spec.use_cb)
            state[n.name] = (L.cb_layer_init(n.spec, shapes[n.inputs[0]],
                                             self.cfg) if is_cb else None)
        return state

    def fused_consumer_map(self) -> Dict[str, str]:
        """producer node name -> the consumer node whose detect its fused
        kernel runs (ConvSpec.fuse_next_detect on a DAG). The consumer is
        the FIRST topo-order CB conv node reading ONLY the producer — the
        same deterministic rule convert_graph_flagship gated on, so the
        converter's static fuse_gate check and apply's wiring always pick
        the same node. Other readers of the producer's hint get the
        predetect STRIPPED (it encodes one specific layer's cache)."""
        out: Dict[str, str] = {}
        for n in self.nodes:
            if not (isinstance(n.spec, ConvSpec)
                    and getattr(n.spec, "fuse_next_detect", False)):
                continue
            for c in self.nodes:
                if (c.inputs == (n.name,) and isinstance(c.spec, ConvSpec)
                        and c.spec.use_cb and not c.spec.forward_hint):
                    out[n.name] = c.name
                    break
        return out

    def _cb_indices(self) -> Dict[str, int]:
        ix, i = {}, 0
        for n in self.nodes:
            if isinstance(n.spec, (ConvSpec, PoolSpec)) and n.spec.use_cb:
                ix[n.name] = i
                i += 1
        return ix

    def apply(self, params: Dict[str, Any], state: Dict[str, Any],
              x: jnp.ndarray, thresholds=None):
        vals: Dict[str, Any] = {"input": x}
        hints: Dict[str, Optional[L.DirtyHint]] = {"input": None}
        new_state: Dict[str, Any] = {}
        stats: Dict[str, Dict] = {}
        cb_i = 0
        fused_map = self.fused_consumer_map()
        cb_ix = self._cb_indices() if fused_map else {}
        by_name = {n.name: n for n in self.nodes}

        def as_array(v):
            return v.crop() if isinstance(v, L.Feature) else v

        for n in self.nodes:
            xin = vals[n.inputs[0]]
            hint = hints[n.inputs[0]]
            if (hint is not None and hint.predetect is not None
                    and fused_map.get(n.inputs[0]) != n.name):
                # this reader is not the consumer the producer's fused
                # kernel served — the predetect is another layer's cache
                hint = hint._replace(predetect=None)
            tau = None
            if (thresholds is not None
                    and isinstance(n.spec, (ConvSpec, PoolSpec))
                    and n.spec.use_cb):
                tau = thresholds[cb_i]
                cb_i += 1
            # named scope -> xprof/HLO op_name carries the node identity
            # (profile_trace.py joins trace ops against it)
            with jax.named_scope(n.name):
                if isinstance(n.spec, ConcatSpec):
                    vals[n.name] = jnp.concatenate(
                        [as_array(vals[i]) for i in n.inputs], axis=-1)
                    in_hints = [hints[i] for i in n.inputs]
                    if any(h is None for h in in_hints):
                        hints[n.name] = None
                    else:
                        m = in_hints[0].mask
                        for h in in_hints[1:]:
                            m = jnp.logical_or(m, h.mask)
                        hints[n.name] = L.DirtyHint(mask=m)
                    new_state[n.name] = None
                    stats[n.name] = {}
                elif isinstance(n.spec, ConvSpec):
                    if n.spec.use_cb:
                        fuse_ctx = None
                        cons = fused_map.get(n.name)
                        if cons is not None and state.get(cons) is not None:
                            spec2 = by_name[cons].spec
                            tau2 = (thresholds[cb_ix[cons]]
                                    if thresholds is not None else None)
                            fuse_ctx = L.FuseCtx(
                                spec=spec2,
                                in_cache=state[cons].in_cache, tau=tau2)
                        y, st, s, h = L.cb_conv_apply(
                            params[n.name], state[n.name], xin, n.spec,
                            self.cfg, tau, hint, fuse_ctx=fuse_ctx)
                    else:
                        from .convert import dense_conv_on_feature
                        y = dense_conv_on_feature(
                            xin, params[n.name], n.spec,
                            jnp.dtype(self.cfg.compute_dtype))
                        st, s, h = None, {}, None
                    vals[n.name], hints[n.name] = y, h
                    new_state[n.name], stats[n.name] = st, s
                elif isinstance(n.spec, PoolSpec):
                    if n.spec.use_cb:
                        y, st, s, h = L.cb_pool_apply(state[n.name], xin,
                                                      n.spec, self.cfg,
                                                      tau, hint)
                    else:
                        y = network.dense_pool(as_array(xin), n.spec)
                        st, s, h = None, {}, None
                    vals[n.name], hints[n.name] = y, h
                    new_state[n.name], stats[n.name] = st, s
                elif isinstance(n.spec, UpsampleSpec):
                    vals[n.name] = network.upsample(as_array(xin), n.spec)
                    hints[n.name] = None
                    new_state[n.name], stats[n.name] = None, {}
                else:
                    raise TypeError(n.spec)
        return as_array(vals[self.output]), new_state, stats

    def apply_refresh(self, params: Dict[str, Any], state: Dict[str, Any],
                      x: jnp.ndarray, thresholds=None):
        """Full-refresh frame for DAG streams: accept everything, recompute
        everything at dense-path speed (layers.cb_conv_refresh /
        cb_pool_refresh). Same signature/pytree structure as ``apply`` so
        runner.scan_video's refresh policies (refresh_every cond,
        refresh_start prolog) work on DAG nets exactly as on sequential
        ones — without it a DAG stream's caches could drift unboundedly
        (VERDICT r2 missing #3). ``thresholds`` is ignored: a refresh is
        tau = -infinity by definition."""
        del thresholds
        vals: Dict[str, Any] = {"input": x}
        new_state: Dict[str, Any] = {}
        stats: Dict[str, Dict] = {}

        def as_array(v):
            return v.crop() if isinstance(v, L.Feature) else v

        for n in self.nodes:
            xin = vals[n.inputs[0]]
            if isinstance(n.spec, ConcatSpec):
                vals[n.name] = jnp.concatenate(
                    [as_array(vals[i]) for i in n.inputs], axis=-1)
                new_state[n.name], stats[n.name] = None, {}
            elif isinstance(n.spec, ConvSpec):
                if n.spec.use_cb:
                    y, st, s, _ = L.cb_conv_refresh(
                        params[n.name], state[n.name], xin, n.spec, self.cfg)
                else:
                    from .convert import dense_conv_on_feature
                    y = dense_conv_on_feature(
                        xin, params[n.name], n.spec,
                        jnp.dtype(self.cfg.compute_dtype))
                    st, s = None, {}
                vals[n.name] = y
                new_state[n.name], stats[n.name] = st, s
            elif isinstance(n.spec, PoolSpec):
                if n.spec.use_cb:
                    y, st, s, _ = L.cb_pool_refresh(state[n.name], xin,
                                                    n.spec, self.cfg)
                else:
                    y = network.dense_pool(as_array(xin), n.spec)
                    st, s = None, {}
                vals[n.name] = y
                new_state[n.name], stats[n.name] = st, s
            elif isinstance(n.spec, UpsampleSpec):
                vals[n.name] = network.upsample(as_array(xin), n.spec)
                new_state[n.name], stats[n.name] = None, {}
            else:
                raise TypeError(n.spec)
        return as_array(vals[self.output]), new_state, stats

    def apply_dense(self, params: Dict[str, Any], x: jnp.ndarray):
        vals: Dict[str, jnp.ndarray] = {"input": x}
        for n in self.nodes:
            xin = vals[n.inputs[0]]
            if isinstance(n.spec, ConcatSpec):
                vals[n.name] = jnp.concatenate([vals[i] for i in n.inputs],
                                               axis=-1)
            elif isinstance(n.spec, ConvSpec):
                vals[n.name] = network.dense_conv(
                    xin, params[n.name][0], params[n.name][1], n.spec)
            elif isinstance(n.spec, PoolSpec):
                vals[n.name] = network.dense_pool(xin, n.spec)
            elif isinstance(n.spec, UpsampleSpec):
                vals[n.name] = network.upsample(xin, n.spec)
        return vals[self.output]

    def num_cb_layers(self) -> int:
        return sum(1 for n in self.nodes
                   if isinstance(n.spec, (ConvSpec, PoolSpec))
                   and n.spec.use_cb)

    def make_ingest(self, frames: jnp.ndarray):
        """Clip-resident ingest — DAG twin of CBNet.make_ingest.

        Only engages when EXACTLY ONE node consumes the raw "input" and
        it is a fused-detect patch_stem conv (every other consumer would
        need the HWC frame materialized, defeating the point); returns
        None otherwise so runner.scan_video falls back to per-frame xs.
        """
        from .ops import flat4 as flat4_ops
        consumers = [n for n in self.nodes if "input" in n.inputs]
        if len(consumers) != 1:
            return None
        s0 = consumers[0].spec
        if not (isinstance(s0, ConvSpec) and s0.use_cb
                and (s0.backend or self.cfg.backend) == "patch_stem"):
            return None
        if not (self.cfg.tile.tile_h == L.HINT_TILE
                and self.cfg.tile.tile_w == L.HINT_TILE):
            return None  # fused-detect gate (layers.cb_conv_apply)
        H, W, C = self.in_shape
        if frames.shape[1:] != (H, W, C) or not flat4_ops.supports(
                (H, W, C), s0.kernel, s0.stride, s0.dilation, s0.padding,
                s0.activation):
            return None
        fg = flat4_ops.flat4_geom(H, W, C)
        clip = flat4_ops.clip_to_flat4(frames, fg)
        return lambda t: flat4_ops.Flat4Clip(
            clip=clip, t=jnp.asarray(t, jnp.int32), h=H, w=W, cin=C)


def convert_graph_flagship(nodes: Sequence[GraphNode], in_shape, cfg=None,
                           output: Optional[str] = None,
                           thresholds: Optional[Sequence[float]] = None,
                           extra_overrides: Optional[Dict[str, str]] = None,
                           fuse_detect: bool = False) -> CBGraphNet:
    """Convert a DAG with the shipped layer policy — the graph twin of
    convert.convert_flagship (VERDICT r2 missing #3), so the faithful
    OpenPose topology gets the same measured policies as sequential nets:

    * small-cin stem nodes (reading "input" with cin < LANE) run the
      sparse ``patch_stem`` backend when the flat4 gate holds on a pallas
      pipeline (bit-identical to the dense stem conv, only dirty tiles
      recomputed; ops/flat4.py), else ``dense_cached`` — the same
      measured policy as convert.flagship_layers.
    * trailing 1x1 convs none of whose DESCENDANTS is a CB layer run plain
      dense: nothing consumes their hint and CB bookkeeping on a 1x1
      outweighs recompute. Applied in reverse topological order so a chain
      of head 1x1s (ctx-1x1 -> out-1x1 -> concat) cascades, while 1x1s
      feeding later CB stages stay CB.
    * aligned pools (window == stride) run hint-forwarded (fused kernel).

    ``thresholds`` is sized by the CONVERTED graph's CB-layer count.
    ``extra_overrides`` maps node NAME -> backend, layered on top of the
    policy above (extra wins) — the hook the measured per-layer policy
    optimizer uses (scripts/optimize_policy.py; sequential twin:
    convert.convert_flagship). Overrides never change the CB-layer count,
    so tuned tau files stay valid.
    """
    from .layers import LANE
    from .netview import NetView
    cfg = cfg or PipelineConfig()
    nodes = list(nodes)
    view = NetView.from_nodes(nodes, in_shape, cfg)
    cb_capable = [r.is_cb for r in view.rows]
    for i in reversed(range(len(nodes))):
        n, row = nodes[i], view.rows[i]
        if not cb_capable[i]:
            continue
        spec = n.spec
        if isinstance(spec, ConvSpec) and "input" in n.inputs \
                and row.in_shape[2] < LANE:
            from .ops import flat4 as flat4_ops
            stem_backend = (
                "patch_stem"
                if (cfg.backend == "pallas"
                    and flat4_ops.supports(row.in_shape, spec.kernel,
                                           spec.stride, spec.dilation,
                                           spec.padding, spec.activation))
                else "dense_cached")
            spec = dataclasses.replace(spec, backend=stem_backend)
        elif isinstance(spec, ConvSpec) and spec.kernel == (1, 1) \
                and not any(cb_capable[j] for j in view.descendants(i)):
            spec = dataclasses.replace(spec, use_cb=False)
            cb_capable[i] = False
        elif isinstance(spec, PoolSpec) and spec.window == spec.stride:
            spec = dataclasses.replace(spec, forward_hint=True)
        if spec is not n.spec:
            nodes[i] = dataclasses.replace(n, spec=spec)
    if extra_overrides:
        by_name = {n.name: i for i, n in enumerate(nodes)}
        for name, backend in extra_overrides.items():
            if name not in by_name:
                raise ValueError(
                    f"extra_overrides: unknown node {name!r} (stale "
                    f"POLICY file measured on an older topology?); "
                    f"nodes: {sorted(by_name)}")
            i = by_name[name]
            # "forward_hint" flips the spec's CB17 mask-forwarding mode
            # instead of a backend (sequential twin: convert_flagship)
            new_spec = (
                dataclasses.replace(nodes[i].spec, forward_hint=True)
                if backend == "forward_hint"
                else dataclasses.replace(nodes[i].spec, backend=backend))
            nodes[i] = dataclasses.replace(nodes[i], spec=new_spec)
    # Elide the never-read input cache of fused forward pools — decided on
    # the FINAL specs (after extra_overrides: a backend override on a pool
    # must veto elision or the runtime's placeholder assert fires) with a
    # fresh NetView so hint analysis follows concat merges exactly like
    # CBGraphNet.apply (netview.hint_reaches; sequential twin:
    # convert.convert_flagship).
    from .layers import _geometry, _layer_cfg, fused_pool_gate, lane_pad
    from .netview import hint_reaches
    view2 = NetView.from_nodes(nodes, in_shape, cfg)
    for i, n in enumerate(nodes):
        spec = n.spec
        if not (isinstance(spec, PoolSpec) and spec.use_cb
                and spec.forward_hint):
            continue
        lcfg = _layer_cfg(spec, cfg)
        h, w, c = view2.rows[i].in_shape
        cpad = lane_pad(c, lcfg)
        g = _geometry(spec, (h, w, cpad), lcfg)
        if fused_pool_gate(spec, g, lcfg, cpad) and hint_reaches(view2, i):
            nodes[i] = dataclasses.replace(
                n, spec=dataclasses.replace(spec, elide_in_cache=True))
    # fused consumer-detect pass — DAG twin of convert_flagship's: mark a
    # plain-pallas CB conv node whose FIRST topo-order only-this-input CB
    # conv reader passes the static fuse gate (the same deterministic rule
    # CBGraphNet.fused_consumer_map applies at runtime; other readers get
    # the predetect stripped in apply). Opt-in (measured 0.99× on the
    # sequential twin; convert_flagship.fuse_detect doc).
    from .layers import fuse_next_gate
    for i, n in enumerate(nodes if fuse_detect else ()):
        cons = next((c for c in nodes
                     if c.inputs == (n.name,) and isinstance(c.spec, ConvSpec)
                     and c.spec.use_cb and not c.spec.forward_hint), None)
        if cons is not None and fuse_next_gate(
                n.spec, cons.spec, view2.rows[i].in_shape, cfg):
            nodes[i] = dataclasses.replace(
                n, spec=dataclasses.replace(n.spec, fuse_next_detect=True))
    return convert_graph(nodes, in_shape, cfg, output=output,
                         thresholds=thresholds)


def convert_graph(nodes: Sequence[GraphNode], in_shape, cfg=None,
                  output: Optional[str] = None,
                  thresholds: Optional[Sequence[float]] = None
                  ) -> CBGraphNet:
    cfg = cfg or PipelineConfig()
    nodes = tuple(nodes)
    if thresholds is not None:
        new_nodes = []
        ti = 0
        for n in nodes:
            if isinstance(n.spec, (ConvSpec, PoolSpec)) and n.spec.use_cb:
                n = dataclasses.replace(
                    n, spec=dataclasses.replace(
                        n.spec, threshold=float(thresholds[ti])))
                ti += 1
            new_nodes.append(n)
        if ti != len(thresholds):
            raise ValueError(f"{len(thresholds)} thresholds for {ti} layers")
        nodes = tuple(new_nodes)
    return CBGraphNet(nodes=nodes, in_shape=tuple(in_shape), cfg=cfg,
                      output=output or nodes[-1].name)
