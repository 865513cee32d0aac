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
from .convert import CBNet
from .metrics import effective_cost_view, effective_flops_view
from .netview import NetView
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


@dataclasses.dataclass
class StressResult:
    """Outcome of deployment-point threshold validation (stress_validate)."""
    thresholds: List[float]            # the vector that should ship
    source: str                        # candidate name it came from
    passed: bool                       # worst-clip degradation <= budget
    rows: List[Dict]                   # per-candidate measured degradation

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)


def stress_validate(net: CBNet, params, candidates: Dict[str, Sequence],
                    clips, metric_fn: Optional[Callable] = None,
                    labels=None, budget: float = 0.005,
                    skip_frames: int = 1,
                    refresh_every: Optional[int] = None,
                    device_metric_fn: Optional[Callable] = None,
                    verbose: bool = False) -> StressResult:
    """Validate candidate tau vectors at the DEPLOYMENT operating point.

    tune() calibrates where sweeping is affordable — possibly a reduced
    resolution (scripts/tune_model.py tunes 21+-layer pose at 360p) and
    necessarily on its two calibration seeds. Selected vectors can be
    accuracy-fragile outside that point: the r3 sequential-pose vector
    (360p-calibrated, grid-saturated) measured 0.125 GT-PCK degradation
    at 720p on a fresh seed while flat tau<=0.04 stayed clean
    (POSE_ACC.json). This is the guard that catches that BEFORE a vector
    ships: measure every candidate on fresh-seed clips at the deployment
    resolution and return the first (in ``candidates`` order) whose
    WORST-clip degradation fits the budget — order candidates
    best-first (tuned vector, then flat fallbacks, descending tau).
    If none passes, the min-worst-degradation candidate is returned with
    ``passed=False``; callers decide whether to ship or re-tune.

    Args:
      net, params: the converted network AT DEPLOYMENT SHAPE (rebuild the
        net if tuning used a reduced resolution; thresholds transfer —
        they bound per-channel activation drift, not pixel counts).
      candidates: ordered {name: tau vector} (dicts preserve insertion
        order); each vector must have one entry per CB layer of ``net``.
      clips: (S, T, H, W, C) or list of (T, H, W, C) validation clips on
        seeds DISJOINT from both calibration and benchmark videos.
      metric_fn / device_metric_fn / labels / skip_frames / refresh_every:
        tune()'s conventions — metric_fn(cb, dense[, labels]) -> float,
        1.0 = no degradation; degradation = 1 - metric, per clip.
      budget: max allowed worst-clip degradation (same units as tune()).
    """
    if isinstance(clips, (list, tuple)):
        # keep LIST inputs host-side: the r5 192-frame deployment horizon
        # makes each 720p clip ~2.1 GB in f32, and materializing every
        # seed on the chip at once OOM'd the stress stage (RESOURCE_
        # EXHAUSTED, r5). The clip-major loop below stages ONE clip at a
        # time.
        labs = (list(labels) if labels is not None
                else [None] * len(clips))
    else:
        clips = jnp.asarray(clips)
        single = clips.ndim == 4
        clips = clips[None] if single else clips
        if labels is not None:
            labels = jnp.asarray(labels)
            labs = labels[None] if single else labels
        else:
            labs = [None] * clips.shape[0]
    if labels is not None:
        assert len(labs) == len(clips), (len(labs), len(clips))
    labels_given = labels is not None
    view = NetView.of(net)
    n_layers = sum(1 for r in view.rows if r.is_cb)
    for nm, tv in candidates.items():
        assert len(tv) == n_layers, (nm, len(tv), n_layers)

    run = _make_runner(net, params, refresh_every)
    if device_metric_fn is not None:
        drun = _make_device_runner(net, params, device_metric_fn,
                                   skip_frames, refresh_every,
                                   with_labels=labels_given)

    # CLIP-MAJOR: stage one clip, compute its dense reference, score all
    # candidates on it, release — peak HBM is one clip + one reference
    # (candidate-major held every seed's clip + reference for the whole
    # pass and OOM'd at the r5 192-frame horizon).
    degs_by_cand = {nm: [] for nm in candidates}
    for f, lab in zip(clips, labs):
        f = jnp.asarray(f)
        lab_d = None if lab is None else jnp.asarray(lab)
        d = run(f, jnp.full((n_layers,), -1.0, jnp.float32))[0]
        if device_metric_fn is not None:
            for nm, tv in candidates.items():
                tvv = jnp.asarray(tv, jnp.float32)
                m, _ = (drun(f, tvv, d, lab_d) if labels_given
                        else drun(f, tvv, d))
                degs_by_cand[nm].append(1.0 - float(m))
        else:
            d_np = np.asarray(d)[skip_frames:]
            for nm, tv in candidates.items():
                ys, _ = run(f, jnp.asarray(tv, jnp.float32))
                cb = np.asarray(ys)[skip_frames:]
                m = (metric_fn(cb, d_np, np.asarray(lab)[skip_frames:])
                     if lab is not None else metric_fn(cb, d_np))
                degs_by_cand[nm].append(1.0 - float(m))
        del f, d, lab_d

    rows, chosen = [], None
    for name, tv in candidates.items():
        degs = degs_by_cand[name]
        row = {"name": name, "thresholds": [float(t) for t in tv],
               "per_clip_degradation": [round(d, 6) for d in degs],
               "worst_degradation": round(max(degs), 6),
               "mean_degradation": round(float(np.mean(degs)), 6)}
        rows.append(row)
        if verbose:
            print(f"stress {name}: worst={row['worst_degradation']:.5f} "
                  f"mean={row['mean_degradation']:.5f}")
        if chosen is None and max(degs) <= budget + 1e-9:
            chosen = row
    passed = chosen is not None
    if chosen is None:
        chosen = min(rows, key=lambda r: r["worst_degradation"])
    return StressResult(thresholds=chosen["thresholds"],
                        source=chosen["name"], passed=passed, rows=rows)


def _make_runner(net: CBNet, params, refresh_every=None):
    """One jitted (frames, thresholds) -> (outputs, stats) closure."""

    @jax.jit
    def run(frames, thresholds):
        ys, _, stats = scan_video(net, params, frames,
                                  thresholds=thresholds,
                                  refresh_every=refresh_every)
        return ys, stats

    return run


def _make_device_runner(net: CBNet, params, device_metric_fn, skip_frames,
                        refresh_every=None, with_labels=False):
    """Jitted (frames, thresholds, dense_ys[, labels]) -> (metric, stats).

    The metric is computed ON DEVICE so each tuner eval fetches one scalar
    plus the (tiny) stats counters instead of the full output stack — the
    output fetch dominated eval time on this host<->TPU link (~10 s for a
    96-frame 720p clip, measured r2)."""

    @jax.jit
    def run(frames, thresholds, dense_ys, labels=None):
        ys, _, stats = scan_video(net, params, frames,
                                  thresholds=thresholds,
                                  refresh_every=refresh_every)
        if with_labels:
            m = device_metric_fn(ys[skip_frames:], dense_ys[skip_frames:],
                                 labels[skip_frames:])
        else:
            m = device_metric_fn(ys[skip_frames:], dense_ys[skip_frames:])
        return m, stats

    return run


def _hint_reaches(view: NetView, ri: int) -> bool:
    from .netview import hint_reaches
    return hint_reaches(view, ri)


def _tau_is_dead(view: NetView, ri: int) -> bool:
    """True iff row ``ri``'s tau is unused at deployment: a forward-hint
    pool whose fused-kernel gate (layers.cb_pool_apply) will hold on this
    net — pallas backend, aligned window==stride>=2 pool on the 8x8 tile
    grid, hint-producing predecessor. Judged conservatively: any unmet
    condition means the pool falls back to re-detection, where tau is
    live."""
    from .layers import _geometry, _layer_cfg, fused_pool_gate, lane_pad
    spec = view.rows[ri].spec
    if isinstance(spec, ConvSpec) and spec.forward_hint:
        # forwarding convs skip detection whenever a hint exists — tau is
        # dead iff the producer always emits one
        return _hint_reaches(view, ri)
    if not (isinstance(spec, PoolSpec) and spec.forward_hint):
        return False
    # The SHARED static gate (layers.fused_pool_gate) with the runtime's
    # own TileGeometry (layers._pool_prep): g.th/g.tw are min(cfg.tile,
    # out-extent), so a deep low-res pool with out_h < tile_h fails the
    # gate and re-detects — its tau is LIVE even when cfg.tile is 8x8.
    # Channel width uses the lane-padded storage width, as at runtime.
    lcfg = _layer_cfg(spec, view.cfg)
    in_h, in_w, in_c = view.rows[ri].in_shape
    cpad = lane_pad(in_c, lcfg)
    g = _geometry(spec, (in_h, in_w, cpad), lcfg)
    if not fused_pool_gate(spec, g, lcfg, cpad):
        return False
    return _hint_reaches(view, ri)


def tune(net: CBNet, params, calib_frames, metric_fn: Callable,
         tau_grid: Sequence[float] = (0.01, 0.02, 0.04, 0.08, 0.16, 0.32),
         budgets: Sequence[float] = (0.001, 0.002, 0.005, 0.01, 0.02),
         budget: float = 0.005, base_tau: float = 0.0,
         skip_frames: int = 1, refresh_every: Optional[int] = None,
         device_metric_fn: Optional[Callable] = None,
         labels=None, verbose: bool = False) -> TuneResult:
    """Tune per-layer thresholds against a calibration clip.

    Args:
      net, params: the converted CB network.
      calib_frames: (T, H, W, C) calibration video.
      metric_fn: (cb_outputs, dense_outputs[, labels]) -> float; 1 = no
        degradation (e.g. partial(miou, num_classes=K), pck, or a
        ground-truth degradation composite — see scripts/tune_model.py).
        Receives outputs with the leading frame axis; gets the third
        ``labels`` argument iff ``labels`` is passed to tune().
      labels: optional ground-truth maps aligned with calib_frames at the
        model's OUTPUT resolution: (T, H', W') or (S, T, H', W') matching
        the calibration-set layout. When given, metric_fn /
        device_metric_fn are called with the per-clip labels (sliced by
        skip_frames like the outputs).
      tau_grid: per-layer sweep grid (ascending).
      budgets: budget values for the Pareto curve.
      budget: the operating budget (max allowed metric drop, absolute).
      base_tau: tau for non-swept layers during sensitivity analysis.
      skip_frames: leading frames excluded from the metric (cold start is
        exact by construction; excluding it sharpens sensitivity).
      refresh_every: periodic full-recompute interval to calibrate UNDER
        (runner.scan_video) — tuning must see the same drift horizon the
        deployment runs with, or steady-state drift invalidates the taus
        (measured r2: a 32-frame calib overestimated 128-frame accuracy
        by 4 pp without refresh).

    Returns TuneResult with selected thresholds and the Pareto samples.
    """
    calib = jnp.asarray(calib_frames)
    # calibration SET: (S, T, H, W, C) = S clips, metric averaged over
    # clips — single-clip calibration is noisy exactly at the 0.5% scale
    # the budget works at (measured r2: per-seed combined drops differed
    # by >0.5 pp), and the reference tunes on video sets [CB19 §V].
    clips = calib[None] if calib.ndim == 4 else calib
    if labels is not None:
        labels = jnp.asarray(labels)
        labels = labels[None] if labels.ndim == 3 else labels
        assert labels.shape[:2] == clips.shape[:2], (labels.shape,
                                                     clips.shape)
    labs = labels if labels is not None else [None] * clips.shape[0]
    view = NetView.of(net)  # sequential CBNet or DAG CBGraphNet
    cb_rows = [i for i, r in enumerate(view.rows) if r.is_cb]
    n_layers = len(cb_rows)
    run = _make_runner(net, params, refresh_every)

    # dense reference outputs = CB with tau < 0 (every pixel recomputed each
    # frame) — reuses the same compiled program instead of a second graph.
    dense_outs = [run(f, jnp.full((n_layers,), -1.0, jnp.float32))[0]
                  for f in clips]

    def _skip_stats(s):
        # drop each clip's cold-start frames BEFORE concatenation — every
        # clip starts from a fresh state, and keeping later clips' fully-
        # changed frames inflates the changed-tile fractions that drive
        # candidate proposal and the cost objectives (ADVICE r2)
        return jax.tree.map(
            lambda a: np.asarray(a)[skip_frames:]
            if np.ndim(a) >= 1 else a, s)

    def _cat_stats(stats_list):
        if len(stats_list) == 1:
            return stats_list[0]
        return jax.tree.map(lambda *xs: np.concatenate(
            [np.atleast_1d(np.asarray(x)) for x in xs]), *stats_list)

    if device_metric_fn is not None:
        # fast path: metric computed on device, one scalar fetched per eval
        # (metrics.miou_device / pck_device); dense outputs never leave HBM
        drun = _make_device_runner(net, params, device_metric_fn,
                                   skip_frames, refresh_every,
                                   with_labels=labels is not None)

        def eval_taus(taus: np.ndarray):
            tv = jnp.asarray(taus, jnp.float32)
            ms, sts = [], []
            for f, d, lab in zip(clips, dense_outs, labs):
                m, stats = drun(f, tv, d, lab) if labels is not None \
                    else drun(f, tv, d)
                ms.append(float(m))
                # one batched transfer; per-leaf fetches pay a tunnel RTT
                sts.append(_skip_stats(jax.device_get(stats)))
            return float(np.mean(ms)), _cat_stats(sts)
    else:
        dense_np = [np.asarray(d)[skip_frames:] for d in dense_outs]

        def eval_taus(taus: np.ndarray):
            tv = jnp.asarray(taus, jnp.float32)
            ms, sts = [], []
            for f, d, lab in zip(clips, dense_np, labs):
                ys, stats = run(f, tv)
                cb = np.asarray(ys)[skip_frames:]
                ms.append(float(
                    metric_fn(cb, d, np.asarray(lab)[skip_frames:])
                    if labels is not None else metric_fn(cb, d)))
                sts.append(_skip_stats(jax.device_get(stats)))
            return float(np.mean(ms)), _cat_stats(sts)

    # Layers whose tau is DEAD at deployment: forward-hint pools on the
    # pallas backend run the fused mask-forwarding kernel, which never
    # reads tau (PoolSpec.forward_hint). Sweeping them wastes |grid|
    # calibration evals per layer and the greedy can "spend" budget on a
    # knob that does nothing (ADVICE r2). NOTE the backend asymmetry: on
    # the jnp backend (and on any fused-gate alignment fallback) the same
    # tau IS live — deadness is judged against the net's own backend.
    tau_dead = [_tau_is_dead(view, ri) for ri in cb_rows]

    # ---- per-layer sensitivity (metric + computed-tile fraction) ----
    sensitivity: Dict[int, List] = {}
    flop_frac: Dict[int, List] = {}
    n_tiles_l: Dict[int, float] = {}
    base_eval = None  # one base-point eval, computed only if a dead-tau
    # layer needs its flat curve (gating it saves a full calibration scan
    # on nets without fused forwarding layers)

    def get_base_eval():
        nonlocal base_eval
        if base_eval is None:
            base_eval = eval_taus(np.full((n_layers,), base_tau,
                                          np.float32))
        return base_eval

    for l in range(n_layers):
        if tau_dead[l]:
            # flat curve at the base point: no eval spent, no projected
            # gain, so the greedy never proposes this knob
            m0, stats0 = get_base_eval()
            s0 = view.stats_of(stats0, view.rows[cb_rows[l]])
            nt = float(np.max(np.asarray(s0["n_tiles"])))
            n_tiles_l[l] = nt
            fr = float(np.mean(np.asarray(s0["changed_tiles"],
                                          np.float64))) / max(nt, 1.0)
            sensitivity[l] = [(float(t), m0) for t in tau_grid]
            flop_frac[l] = [fr] * len(tau_grid)
            if verbose:
                print(f"layer {l}: tau DEAD (fused forward-hint pool), "
                      "sweep skipped")
            continue
        curve = []
        fracs = []
        for tau in tau_grid:
            taus = np.full((n_layers,), base_tau, np.float32)
            taus[l] = tau
            m, stats = eval_taus(taus)
            s = view.stats_of(stats, view.rows[cb_rows[l]])
            nt = float(np.max(np.asarray(s["n_tiles"])))
            n_tiles_l[l] = nt
            # changed_tiles (the mask size), not computed_tiles: for
            # dense_cached layers compute never shrinks but the mask is the
            # dirty HINT gating all downstream detection, and for CB layers
            # the two coincide — so the mask is the right sparsity proxy
            # for the greedy's gain term everywhere.
            # (cold-start frames already dropped per clip in _skip_stats)
            comp = np.asarray(s["changed_tiles"], np.float64)
            fracs.append(float(np.mean(comp)) / max(nt, 1.0))
            curve.append((float(tau), m))
            if verbose:
                print(f"layer {l} tau={tau:.3g}: metric={m:.4f} "
                      f"frac={fracs[-1]:.3f}")
        sensitivity[l] = curve
        flop_frac[l] = fracs

    # Dense FLOPs gated by layer l's tau — the greedy's gain units.
    # * regular CB conv: its own dense total.
    # * pool: no MACs itself; its tau gates its consumer convs' sparsity —
    #   half their total (independence approximation of [CB19 §V]).
    # * dense_cached: computes its full conv every frame regardless of tau,
    #   but its tau sizes the dirty HINT that gates detection and recompute
    #   of EVERYTHING downstream — gain = the total downstream dense FLOPs.
    #   (A tau=0 stem on noisy video emits a full-map hint and poisons the
    #   whole chain's wall-clock; measured r2, bench at 0.44x vs 2.5x.)
    # Topology-agnostic: "downstream"/"consumer" follow the NetView edges,
    # which on a DAG include every branch (the reference tunes the real
    # OpenPose DAG the same way, CB19 §V).
    layer_gain_flops = []
    for l in range(n_layers):
        ri = cb_rows[l]
        row = view.rows[ri]
        if str(getattr(row.spec, "backend", None) or "").startswith("dense_cached"):
            own = view.downstream_conv_flops(ri)
        elif row.dense_flops > 0:
            own = float(row.dense_flops)
        else:  # pool
            own = 0.5 * view.next_conv_flops(ri)
        layer_gain_flops.append(own)

    # ---- budgeted selection: MEASURED ratio-greedy over the TOTAL budget ----
    # The per-layer independence approximation is unreliable here: layer
    # taus are partial SUBSTITUTES (a producer's tau shrinks the hint that
    # gates its consumers, so raising one layer changes every other layer's
    # marginal value), and curves are non-monotone. So selection measures
    # every accepted move on the combined network:
    #   1. Candidate proposal (cheap, from the solo sensitivity curves):
    #      per layer, the grid tau with the largest projected mask-fraction
    #      gain whose SOLO drop fits the remaining measured budget.
    #   2. Each candidate (current taus + that one change) is EVALUATED;
    #      candidates violating the measured budget are discarded.
    #   3. Accept the move with the best measured flop-gain / metric-drop
    #      ratio; repeat until no candidate fits.
    # Every accepted point is measured-valid: the returned operating point
    # always meets the budget on the calibration clip. Cost: O(moves *
    # n_layers) evals of one pre-compiled program.
    def ef_of(stats) -> float:
        # selection objective: roofline-aware cost (FLOPs + detect traffic)
        # — pure FLOP reduction misprices bandwidth-bound detection and
        # picks wall-clock-terrible operating points (metrics.py)
        return effective_cost_view(view, stats, net.cfg.tile.tile_h,
                                   net.cfg.tile.tile_w)["cost_reduction"]

    def flops_of(stats) -> float:
        return effective_flops_view(view, stats, net.cfg.tile.tile_h,
                                    net.cfg.tile.tile_w)["flop_reduction"]

    def candidates_for(pos):
        # Per layer, the grid tau with the best projected mask-fraction
        # gain. NO solo-drop budget pre-filter: solo sensitivities measure
        # a layer with every other tau at base, which systematically
        # OVERestimates the combined drop (downstream quantization masks
        # upstream drift), and pre-filtering on it starves exactly the
        # high-gain moves — the measured combined eval is the only
        # admission test.
        out = []
        for l in range(n_layers):
            prev_frac = flop_frac[l][pos[l]] if pos[l] >= 0 else 1.0
            best_j, best_gain = None, 0.0
            for j in range(pos[l] + 1, len(tau_grid)):
                gain = max(0.0, prev_frac - flop_frac[l][j]) \
                    * layer_gain_flops[l]
                if gain > best_gain:
                    best_j, best_gain = j, gain
            if best_j is not None:
                out.append((l, best_j))
        # UNIFORM moves: raise every layer below grid[j] to grid[j]. Layer
        # taus are partial substitutes, so a uniform step is often cheaper
        # than the sum of its parts and the per-layer greedy cannot reach
        # it (each component alone may look budget-infeasible).
        for j in range(len(tau_grid)):
            if any(p < j for p in pos):
                out.append(("ALL", j))
        return out

    def taus_of(pos):
        taus = np.full((n_layers,), base_tau, np.float32)
        for l in range(n_layers):
            if pos[l] >= 0:
                taus[l] = tau_grid[pos[l]]
        return taus

    pareto = []
    pos = [-1] * n_layers
    m_cur, stats_cur = eval_taus(taus_of(pos))
    ef_cur = ef_of(stats_cur)
    seen: Dict = {}
    for b in sorted(set(list(budgets) + [budget])):
        # warm-start each budget from the previous (smaller) solution
        while True:
            cands = candidates_for(pos)
            best = None
            for l, j in cands:
                trial = list(pos)
                if l == "ALL":
                    trial = [max(p, j) for p in trial]
                else:
                    trial[l] = j
                key = tuple(trial)
                if key not in seen:
                    seen[key] = eval_taus(taus_of(trial))
                m, stats = seen[key]
                if 1.0 - m > b + 1e-9:
                    continue
                gain = ef_of(stats) - ef_cur
                if gain <= 1e-6:
                    continue
                drop = max(1e-9, (1.0 - m) - (1.0 - m_cur))
                ratio = gain / drop
                if best is None or ratio > best[0]:
                    best = (ratio, l, j, m, stats)
            if best is None:
                break
            _, l, j, m_cur, stats_cur = best
            if l == "ALL":
                pos = [max(p, j) for p in pos]
            else:
                pos[l] = j
            ef_cur = ef_of(stats_cur)
            if verbose:
                print(f"  accept layer {l} tau={tau_grid[j]:.3g}: "
                      f"metric={m_cur:.4f} flops={ef_cur:.2f}x")
        pareto.append({
            "budget": float(b),
            "metric": m_cur,
            "flop_reduction": flops_of(stats_cur),
            "cost_reduction": ef_cur,
            "thresholds": [float(t) for t in taus_of(pos)],
        })
        if verbose:
            print(f"budget {b}: metric={m_cur:.4f} "
                  f"flops={pareto[-1]['flop_reduction']:.2f}x "
                  f"cost={ef_cur:.2f}x")

    chosen = min(pareto, key=lambda p: abs(p["budget"] - budget))
    return TuneResult(
        thresholds=chosen["thresholds"],
        metric=chosen["metric"],
        flop_reduction=chosen["flop_reduction"],
        sensitivity=sensitivity,
        pareto=pareto,
        flop_frac=flop_frac,
    )
