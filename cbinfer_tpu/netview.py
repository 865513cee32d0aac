"""Uniform layer-table view over sequential (CBNet) and DAG (CBGraphNet)
networks.

The reference applies its per-layer machinery — threshold tuning, FLOP
accounting, stage policies — uniformly to whatever topology the converted
model has (arXiv 1808.05488 §V tunes the real OpenPose DAG). Here the
sequential CBNet and the DAG CBGraphNet expose different stats containers
(list vs name-keyed dict) and different shape-propagation rules; NetView
flattens both into one ordered row table so the tuner (tuner.py) and the
compute accounting (metrics.py) are written once against it.

Row order equals execution order, which is also the CB-threshold-vector
order both net types consume (CBNet.apply / CBGraphNet.apply), so
``view.cb_rows()`` indexes align with tau vectors by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

from .config import ConvSpec, PoolSpec


@dataclasses.dataclass(frozen=True)
class LayerRow:
    key: Any                       # stats key: int index (CBNet) / node name
    spec: Any                      # LayerSpec | ConcatSpec
    in_shape: Tuple[int, int, int]   # logical input (H, W, C)
    out_shape: Tuple[int, int, int]  # logical output (H, W, C)
    producers: Tuple[int, ...]     # row indices feeding this row ("input"
                                   # contributes no entry)

    @property
    def is_cb(self) -> bool:
        return isinstance(self.spec, (ConvSpec, PoolSpec)) and self.spec.use_cb

    @property
    def dense_flops(self) -> int:
        """Full-frame MAC*2 of this row (0 for non-conv)."""
        if not isinstance(self.spec, ConvSpec):
            return 0
        kh, kw = self.spec.kernel
        oh, ow, _ = self.out_shape
        return 2 * oh * ow * kh * kw * self.in_shape[2] * self.spec.features


@dataclasses.dataclass(frozen=True)
class NetView:
    rows: Tuple[LayerRow, ...]
    in_shape: Tuple[int, int, int]
    cfg: Any  # PipelineConfig (may be None when built from bare specs)

    # ------------------------------ builders ------------------------------

    @staticmethod
    def from_specs(specs: Sequence, in_shape, cfg=None) -> "NetView":
        from .network import out_shapes
        shapes = [tuple(in_shape)] + [tuple(s)
                                      for s in out_shapes(specs, in_shape)]
        rows = tuple(
            LayerRow(key=i, spec=spec, in_shape=shapes[i],
                     out_shape=shapes[i + 1],
                     producers=(i - 1,) if i > 0 else ())
            for i, spec in enumerate(specs))
        return NetView(rows=rows, in_shape=tuple(in_shape), cfg=cfg)

    @staticmethod
    def from_nodes(nodes: Sequence, in_shape, cfg=None) -> "NetView":
        from .graph import node_out_shapes
        shapes = node_out_shapes(nodes, in_shape)
        index = {"input": None}
        rows: List[LayerRow] = []
        for i, n in enumerate(nodes):
            index[n.name] = i
            rows.append(LayerRow(
                key=n.name, spec=n.spec, in_shape=tuple(shapes[n.inputs[0]]),
                out_shape=tuple(shapes[n.name]),
                producers=tuple(index[p] for p in n.inputs
                                if index[p] is not None)))
        return NetView(rows=tuple(rows), in_shape=tuple(in_shape), cfg=cfg)

    @staticmethod
    def of(net) -> "NetView":
        """Build from a CBNet or CBGraphNet."""
        if hasattr(net, "nodes"):
            return NetView.from_nodes(net.nodes, net.in_shape, net.cfg)
        return NetView.from_specs(net.specs, net.in_shape, net.cfg)

    # ------------------------------ queries -------------------------------

    def stats_of(self, stats, row: LayerRow):
        """The row's per-frame counters out of a scan's stats channel
        (list for CBNet, name-keyed dict for CBGraphNet)."""
        return stats[row.key]

    def cb_rows(self) -> List[LayerRow]:
        """CB layers in execution (= threshold-vector) order."""
        return [r for r in self.rows if r.is_cb]

    def consumers(self, i: int) -> List[int]:
        return [j for j, r in enumerate(self.rows) if i in r.producers]

    def descendants(self, i: int) -> List[int]:
        """All rows downstream of row i (DFS over the consumer relation)."""
        seen, stack = set(), [i]
        while stack:
            for j in self.consumers(stack.pop()):
                if j not in seen:
                    seen.add(j)
                    stack.append(j)
        return sorted(seen)

    def downstream_conv_flops(self, i: int) -> float:
        """Dense FLOPs of every conv downstream of row i — the tuner's gain
        unit for dense_cached layers (their tau sizes the hint gating all
        downstream recompute, not their own conv)."""
        return float(sum(self.rows[j].dense_flops
                         for j in self.descendants(i)))

    def next_conv_flops(self, i: int) -> float:
        """Dense FLOPs of the nearest conv consumer(s) of row i — the
        tuner's gain unit for pools (a pool's tau gates the convs that read
        its output). BFS stops at the first conv on each branch."""
        total, stack, seen = 0.0, list(self.consumers(i)), set()
        while stack:
            j = stack.pop()
            if j in seen:
                continue
            seen.add(j)
            if isinstance(self.rows[j].spec, ConvSpec):
                total += self.rows[j].dense_flops
            else:
                stack.extend(self.consumers(j))
        return total

    def producer_row(self, i: int) -> Optional[LayerRow]:
        """The single producer of row i's primary input, if any."""
        ps = self.rows[i].producers
        return self.rows[ps[0]] if ps else None


def hint_reaches(view: "NetView", ri: int) -> bool:
    """True iff row ri's PRODUCER side always delivers a dirty hint to it:
    every producer is CB, following transitively through concat rows
    (graph.CBGraphNet merges hints at concats and drops the merged hint if
    ANY input lacks one — mirror that exactly). Rows with no producer read
    the network input, which carries no hint. Shared by the tuner's
    dead-tau analysis and the flagship converters' in-cache elision."""
    from .graph import ConcatSpec
    row = view.rows[ri]
    if not row.producers:
        return False
    for p in row.producers:
        prow = view.rows[p]
        if prow.is_cb:
            continue
        if isinstance(prow.spec, ConcatSpec):
            if not hint_reaches(view, p):
                return False
            continue
        return False  # plain-dense / upsample: hint cleared
    return True
