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

from .convert import CBNet, num_cb_layers
from .metrics import effective_flops
from .runner import scan_video


@dataclasses.dataclass
class TuneResult:
    thresholds: List[float]            # selected tau per CB layer
    metric: float                      # combined metric at selection
    flop_reduction: float              # effective-FLOP reduction at selection
    sensitivity: Dict[int, List]       # layer -> [(tau, metric), ...]
    pareto: List[Dict]                 # [{budget, metric, flop_reduction,
                                       #   thresholds}, ...]

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

    # ---- per-layer sensitivity ----
    sensitivity: Dict[int, List] = {}
    for l in range(n_layers):
        curve = []
        for tau in tau_grid:
            taus = np.full((n_layers,), base_tau, np.float32)
            taus[l] = tau
            m, _ = eval_taus(taus)
            curve.append((float(tau), m))
            if verbose:
                print(f"layer {l} tau={tau:.3g}: metric={m:.4f}")
        sensitivity[l] = curve

    # ---- budgeted selection + Pareto ----
    def select(b: float) -> np.ndarray:
        per_layer = b / n_layers
        taus = np.full((n_layers,), base_tau, np.float32)
        for l, curve in sensitivity.items():
            best = base_tau
            for tau, m in curve:
                if 1.0 - m <= per_layer:
                    best = max(best, tau)
            taus[l] = best
        return taus

    pareto = []
    for b in sorted(set(list(budgets) + [budget])):
        taus = select(b)
        m, stats = eval_taus(taus)
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
    )
