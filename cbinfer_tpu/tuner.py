"""Per-layer threshold auto-tuner (SURVEY.md C13; arXiv 1808.05488 §V).

Reproduces the reference's tuning procedure: per-layer sensitivity sweeps of
the end metric against a calibration video (one layer's tau varied, others
held at a base setting), budgeted per-layer threshold selection, combined
validation, and the accuracy/compute Pareto curve (the papers' headline
figure: throughput-vs-accuracy as the budget varies).

TPU-native twist: thresholds are RUNTIME scalars in the compiled scan
(CBNet.apply(..., thresholds=...)), so the entire sweep reuses ONE compiled
program per model — the reference recompiles nothing either (CUDA kernels
take tau as an argument), and naive static-tau jitting would pay
L x |grid| compiles.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import ConvSpec, PoolSpec
from .convert import CBNet, num_cb_layers
from .metrics import effective_flops, layer_flops_per_tile
from .runner import scan_video


@dataclasses.dataclass
class TuneResult:
    thresholds: List[float]            # selected tau per CB layer
    metric: float                      # combined metric at selection
    flop_reduction: float              # effective-FLOP reduction at selection
    sensitivity: Dict[int, List]       # layer -> [(tau, metric), ...]
    pareto: List[Dict]                 # [{budget, metric, flop_reduction,
                                       #   thresholds}, ...]
    flop_frac: Dict[int, List] = dataclasses.field(default_factory=dict)
                                       # layer -> computed-tile fraction per
                                       # tau_grid entry (sensitivity sweep)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)


def _make_runner(net: CBNet, params):
    """One jitted (frames, thresholds) -> (outputs, stats) closure."""

    @jax.jit
    def run(frames, thresholds):
        ys, _, stats = scan_video(net, params, frames,
                                  thresholds=thresholds)
        return ys, stats

    return run


def tune(net: CBNet, params, calib_frames, metric_fn: Callable,
         tau_grid: Sequence[float] = (0.01, 0.02, 0.04, 0.08, 0.16, 0.32),
         budgets: Sequence[float] = (0.001, 0.002, 0.005, 0.01, 0.02),
         budget: float = 0.005, base_tau: float = 0.0,
         skip_frames: int = 1, verbose: bool = False) -> TuneResult:
    """Tune per-layer thresholds against a calibration clip.

    Args:
      net, params: the converted CB network.
      calib_frames: (T, H, W, C) calibration video.
      metric_fn: (cb_outputs, dense_outputs) -> float in [0, 1]; 1 = perfect
        agreement with the dense network (e.g. partial(miou, num_classes=K)
        or pck). Receives outputs with the leading frame axis.
      tau_grid: per-layer sweep grid (ascending).
      budgets: budget values for the Pareto curve.
      budget: the operating budget (max allowed metric drop, absolute).
      base_tau: tau for non-swept layers during sensitivity analysis.
      skip_frames: leading frames excluded from the metric (cold start is
        exact by construction; excluding it sharpens sensitivity).

    Returns TuneResult with selected thresholds and the Pareto samples.
    """
    frames = jnp.asarray(calib_frames)
    n_layers = num_cb_layers(net.specs)
    run = _make_runner(net, params)

    # dense reference outputs = CB with tau < 0 (every pixel recomputed each
    # frame) — reuses the same compiled program instead of a second graph.
    dense_out, _ = run(frames, jnp.full((n_layers,), -1.0, jnp.float32))
    dense_out = np.asarray(dense_out)[skip_frames:]

    def eval_taus(taus: np.ndarray):
        ys, stats = run(frames, jnp.asarray(taus, jnp.float32))
        m = float(metric_fn(np.asarray(ys)[skip_frames:], dense_out))
        return m, stats

    # Map CB-layer index -> spec index (stats are per spec) and per-layer
    # dense-FLOP totals, the greedy objective's "gain" units.
    cb_spec_idx = [i for i, s in enumerate(net.specs)
                   if isinstance(s, (ConvSpec, PoolSpec)) and s.use_cb]
    per_tile = layer_flops_per_tile(net.specs, net.in_shape,
                                    net.cfg.tile.tile_h, net.cfg.tile.tile_w)

    # ---- per-layer sensitivity (metric + computed-tile fraction) ----
    sensitivity: Dict[int, List] = {}
    flop_frac: Dict[int, List] = {}
    n_tiles_l: Dict[int, float] = {}
    for l in range(n_layers):
        curve = []
        fracs = []
        for tau in tau_grid:
            taus = np.full((n_layers,), base_tau, np.float32)
            taus[l] = tau
            m, stats = eval_taus(taus)
            s = stats[cb_spec_idx[l]]
            nt = float(np.max(np.asarray(s["n_tiles"])))
            n_tiles_l[l] = nt
            # changed_tiles (the mask size), not computed_tiles: for
            # dense_cached layers compute never shrinks but the mask is the
            # dirty HINT gating all downstream detection, and for CB layers
            # the two coincide — so the mask is the right sparsity proxy
            # for the greedy's gain term everywhere.
            # (skip the cold-start frame: it is always fully changed)
            comp = np.asarray(s["changed_tiles"],
                              np.float64)[skip_frames:]
            fracs.append(float(np.mean(comp)) / max(nt, 1.0))
            curve.append((float(tau), m))
            if verbose:
                print(f"layer {l} tau={tau:.3g}: metric={m:.4f} "
                      f"frac={fracs[-1]:.3f}")
        sensitivity[l] = curve
        flop_frac[l] = fracs

    # Dense FLOPs gated by layer l's tau — the greedy's gain units.
    # * regular CB conv: its own dense total.
    # * pool: no MACs itself; its tau gates the next conv's sparsity — half
    #   the next conv's total (independence approximation of [CB19 §V]).
    # * dense_cached: computes its full conv every frame regardless of tau,
    #   but its tau sizes the dirty HINT that gates detection and recompute
    #   of EVERYTHING downstream — gain = the total downstream dense FLOPs.
    #   (A tau=0 stem on noisy video emits a full-map hint and poisons the
    #   whole chain's wall-clock; measured r2, bench at 0.44x vs 2.5x.)
    from .network import out_shapes
    shapes = [tuple(net.in_shape)] + list(out_shapes(net.specs,
                                                     net.in_shape))
    layer_total = []
    for j, spec in enumerate(net.specs):
        if isinstance(spec, ConvSpec):
            kh_, kw_ = spec.kernel
            oh, ow, _ = shapes[j + 1]
            layer_total.append(2 * oh * ow * kh_ * kw_
                               * shapes[j][2] * spec.features)
        else:
            layer_total.append(0)
    layer_gain_flops = []
    for l in range(n_layers):
        si = cb_spec_idx[l]
        spec = net.specs[si]
        if getattr(spec, "backend", None) == "dense_cached":
            own = float(sum(layer_total[si + 1:]))
        elif layer_total[si] > 0:
            own = float(layer_total[si])
        else:  # pool
            nxt = next((j for j in range(si + 1, len(net.specs))
                        if layer_total[j] > 0), None)
            own = 0.5 * layer_total[nxt] if nxt is not None else 0.0
        layer_gain_flops.append(own)

    # ---- budgeted selection: greedy over the TOTAL budget ----
    # State = per-layer grid position (-1 = base_tau). A move raises one
    # layer to ANY higher grid tau (jumps, not just adjacent steps: metric
    # curves are often non-monotone — a mid tau can cost more accuracy than
    # a high one — and FLOP gains frequently appear only beyond several
    # zero-gain grid points). A move's projected cost is the layer's metric
    # drop delta from the sensitivity curve (additive approximation), its
    # gain the projected FLOPs saved. Take the best gain/cost move while
    # the projected total stays within budget, then validate against the
    # measured combined metric and back the budget off if the projection
    # was optimistic — the returned point always meets the budget on the
    # calibration clip.
    def select(b: float) -> np.ndarray:
        pos = [-1] * n_layers
        spent = 0.0
        while True:
            best = None
            for l in range(n_layers):
                prev_drop = (1.0 - sensitivity[l][pos[l]][1]) \
                    if pos[l] >= 0 else 0.0
                prev_frac = flop_frac[l][pos[l]] if pos[l] >= 0 else 1.0
                for j in range(pos[l] + 1, len(tau_grid)):
                    cost = max(0.0,
                               (1.0 - sensitivity[l][j][1]) - prev_drop)
                    gain = max(0.0, prev_frac - flop_frac[l][j]) \
                        * layer_gain_flops[l]
                    if spent + cost > b + 1e-12 or gain <= 0.0:
                        continue
                    ratio = gain / max(cost, 1e-9)
                    if best is None or ratio > best[0]:
                        best = (ratio, l, j, cost)
            if best is None:
                break
            _, l, j, cost = best
            pos[l] = j
            spent += cost
        taus = np.full((n_layers,), base_tau, np.float32)
        for l in range(n_layers):
            if pos[l] >= 0:
                taus[l] = tau_grid[pos[l]]
        return taus

    def select_validated(b: float):
        """Greedy-select, then shrink the projected budget until the
        MEASURED combined drop fits within b (<= ~5 extra evals)."""
        trial = b
        taus = select(trial)
        m, stats = eval_taus(taus)
        tried = {tuple(taus)}
        while 1.0 - m > b + 1e-9 and trial > b / 64:
            trial /= 2.0
            taus2 = select(trial)
            if tuple(taus2) in tried:
                continue
            tried.add(tuple(taus2))
            taus, (m, stats) = taus2, eval_taus(taus2)
        if 1.0 - m > b + 1e-9:  # last resort: exact base point
            taus = np.full((n_layers,), base_tau, np.float32)
            m, stats = eval_taus(taus)
        return taus, m, stats

    pareto = []
    for b in sorted(set(list(budgets) + [budget])):
        taus, m, stats = select_validated(b)
        ef = effective_flops(stats, net.specs, net.in_shape,
                             net.cfg.tile.tile_h, net.cfg.tile.tile_w)
        pareto.append({
            "budget": float(b),
            "metric": m,
            "flop_reduction": ef["flop_reduction"],
            "thresholds": [float(t) for t in taus],
        })
        if verbose:
            print(f"budget {b}: metric={m:.4f} "
                  f"flop_reduction={ef['flop_reduction']:.2f}x")

    chosen = min(pareto, key=lambda p: abs(p["budget"] - budget))
    return TuneResult(
        thresholds=chosen["thresholds"],
        metric=chosen["metric"],
        flop_reduction=chosen["flop_reduction"],
        sensitivity=sensitivity,
        pareto=pareto,
        flop_frac=flop_frac,
    )
