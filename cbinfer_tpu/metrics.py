"""Accuracy metrics + compute accounting (SURVEY.md C15).

The reference evaluates mIoU (semantic segmentation / scene labeling) and
PCK (pose keypoints) of the change-based network against the DENSE network's
own outputs on the same video (arXiv 1808.05488 §V-VI) — the dense model is
the ground truth, since CBinfer's contract is "approximate the dense net",
not "be more accurate than it". Effective-FLOP accounting comes from the
per-layer computed-tile counters the pipeline already returns.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from .config import ConvSpec


# ------------------------------- accuracy -----------------------------------


def miou(pred_logits: np.ndarray, ref_logits: np.ndarray,
         num_classes: int) -> float:
    """Mean IoU of argmax maps, CB vs dense. Accepts (..., H, W, C) logits."""
    pred = np.argmax(pred_logits, axis=-1).reshape(-1)
    ref = np.argmax(ref_logits, axis=-1).reshape(-1)
    ious = []
    for c in range(num_classes):
        inter = np.sum((pred == c) & (ref == c))
        union = np.sum((pred == c) | (ref == c))
        if union > 0:
            ious.append(inter / union)
    return float(np.mean(ious)) if ious else 1.0


def miou_labels(pred_logits: np.ndarray, labels: np.ndarray,
                num_classes: int) -> float:
    """Mean IoU of argmax maps against GROUND-TRUTH class ids.

    The degradation pillar (BASELINE "mIoU/PCK delta vs full-frame") is
    miou_labels(dense) - miou_labels(cb): the task-metric cost of running
    change-based instead of full-frame. Agreement-style mIoU (CB argmax vs
    dense argmax, `miou`) is ill-conditioned for this: both
    implementations flip near-boundary pixels of RARE classes under bf16
    rounding (measured: tau=0 CB-vs-dense agreement ~0.991 with
    single-frame dips to 0.79 while both outputs are equally accurate),
    so implementation fp noise dominates the budget. Ground truth is free
    on synthetic video (video.SpriteVideo.label).

    ``pred_logits`` may also be an ALREADY-ARGMAXED class-id map of the
    same rank as ``labels`` (the full-resolution argmax-then-upsample
    eval path, scripts/eval_headline.py)."""
    pred_logits = np.asarray(pred_logits)
    if pred_logits.ndim == np.asarray(labels).ndim:
        pred = pred_logits.reshape(-1)
    else:
        pred = np.argmax(pred_logits, axis=-1).reshape(-1)
    ref = np.asarray(labels).reshape(-1)
    ious = []
    for c in range(num_classes):
        inter = np.sum((pred == c) & (ref == c))
        union = np.sum((pred == c) | (ref == c))
        if union > 0:
            ious.append(inter / union)
    return float(np.mean(ious)) if ious else 1.0


def pixel_accuracy(pred_logits: np.ndarray, ref_logits: np.ndarray) -> float:
    pred = np.argmax(pred_logits, axis=-1)
    ref = np.argmax(ref_logits, axis=-1)
    return float(np.mean(pred == ref))


def keypoints_from_heatmaps(heatmaps: np.ndarray) -> np.ndarray:
    """(H, W, K) heatmaps -> (K, 2) [row, col] argmax keypoints."""
    H, W, K = heatmaps.shape
    flat = heatmaps.reshape(H * W, K).argmax(axis=0)
    return np.stack([flat // W, flat % W], axis=-1)


def pck(pred_heatmaps: np.ndarray, ref_heatmaps: np.ndarray,
        alpha: float = 0.05) -> float:
    """PCK of CB keypoints vs dense keypoints.

    A keypoint is 'correct' if within alpha * max(H, W) of the dense-model
    keypoint. Accepts (H, W, K) or (T, H, W, K).
    """
    if pred_heatmaps.ndim == 4:
        if len(pred_heatmaps) != len(ref_heatmaps):
            raise ValueError(
                f"frame-count mismatch: {len(pred_heatmaps)} vs "
                f"{len(ref_heatmaps)} (zip would silently truncate)")
        vals = [pck(p, r, alpha) for p, r in zip(pred_heatmaps, ref_heatmaps)]
        return float(np.mean(vals))
    H, W, _ = pred_heatmaps.shape
    thresh = alpha * max(H, W)
    kp_p = keypoints_from_heatmaps(pred_heatmaps)
    kp_r = keypoints_from_heatmaps(ref_heatmaps)
    dist = np.linalg.norm((kp_p - kp_r).astype(np.float64), axis=-1)
    return float(np.mean(dist <= thresh))


def pck_gt(pred: np.ndarray, kps: np.ndarray, valid: np.ndarray,
           stride: int, alpha: float = 0.05,
           num_keypoints: int = 18) -> float:
    """PCK against GROUND-TRUTH keypoints (the BASELINE accuracy pillar
    for pose, mirroring miou_labels for seg).

    pred: (..., H, W, C) model output with layout [paf | heat] — the heat
    channels are the LAST ``num_keypoints`` (video.pose_targets). kps:
    (..., num_keypoints, 2) full-resolution [y, x]; valid: (...,
    num_keypoints) bool. A keypoint is correct iff the channel argmax on
    the stride-s output grid is within alpha * max(H, W) grid pixels of
    the ground-truth location. Mean over valid keypoints."""
    pred = np.asarray(pred)
    *lead, H, W, C = pred.shape
    heat = pred[..., C - num_keypoints:].reshape((-1, H * W, num_keypoints))
    flat = heat.argmax(axis=1)
    py, px = flat // W, flat % W
    gt = np.asarray(kps, np.float64).reshape((-1, num_keypoints, 2)) / stride
    dist = np.hypot(py - gt[..., 0], px - gt[..., 1])
    ok = (dist <= alpha * max(H, W))
    v = np.asarray(valid, bool).reshape((-1, num_keypoints))
    return float(ok[v].mean()) if v.any() else 1.0


# ------------------------ device-side (jnp) metrics --------------------------
# The host metrics above are the oracles; these jnp twins run INSIDE a jit
# so evaluation loops (the threshold tuner) fetch one scalar instead of the
# full output maps — a 96-frame 720p logits stack is ~44 MB, which costs
# ~10 s/eval over this host<->TPU link (measured r2).


def _iu_device(pred_ids, ref_ids, num_classes: int, dtype):
    """Shared per-class (intersection, union) pixel counts — the ONE
    implementation behind the four device twins below (a fix here must
    not need repeating; the host oracles are miou/miou_labels)."""
    import jax.numpy as jnp
    c = jnp.arange(num_classes)
    pc = (pred_ids.reshape(-1)[None, :] == c[:, None])
    rc = (ref_ids.reshape(-1)[None, :] == c[:, None])
    inter = jnp.sum(pc & rc, axis=1).astype(dtype)
    union = jnp.sum(pc | rc, axis=1).astype(dtype)
    return inter, union


def _miou_from_iu(inter, union):
    """Reduce per-class counts to mIoU with HOST-ORACLE edge semantics:
    union==0 classes are skipped, and if NO class is present the result
    is the vacuous 1.0 exactly like miou/miou_labels (returning 0.0 here
    was a 100 pp host/device divergence — same class of edge pck_gt's
    device twin patches)."""
    import jax.numpy as jnp
    present = union > 0
    iou = jnp.where(present, inter / jnp.maximum(union, 1.0), 0.0)
    n = jnp.sum(present)
    return jnp.where(n > 0, jnp.sum(iou) / jnp.maximum(n, 1), 1.0)


def miou_device(pred_logits, ref_logits, num_classes: int):
    """jnp mean-IoU of argmax maps; classes absent from BOTH maps are
    excluded from the mean exactly as in `miou` (union==0 => skipped)."""
    import jax.numpy as jnp
    inter, union = _iu_device(jnp.argmax(pred_logits, axis=-1),
                              jnp.argmax(ref_logits, axis=-1),
                              num_classes, jnp.float32)
    return _miou_from_iu(inter, union)


def miou_iu_device(pred_logits, ref_logits, num_classes: int):
    """jnp per-class (intersection, union) pixel counts of argmax maps.

    Partial sums for CHUNKED mIoU: accumulate across chunks on the host
    (two num_classes-long vectors per chunk — a scalar-sized fetch), then
    reduce with ``merge_iu``. Chunking keeps each accuracy dispatch to one
    scan's footprint (a single 720p program holding CB + dense 64-frame
    scans OOM'd the 16 GB chip, BENCH_r02)."""
    import jax.numpy as jnp
    return _iu_device(jnp.argmax(pred_logits, axis=-1),
                      jnp.argmax(ref_logits, axis=-1),
                      num_classes, jnp.int32)


def miou_labels_device(pred_logits, labels, num_classes: int):
    """jnp twin of `miou_labels` (ground-truth mIoU as one device scalar)."""
    import jax.numpy as jnp
    inter, union = _iu_device(jnp.argmax(pred_logits, axis=-1), labels,
                              num_classes, jnp.float32)
    return _miou_from_iu(inter, union)


def miou_labels_iu_device(pred_logits, labels, num_classes: int):
    """Per-class (intersection, union) counts vs ground truth — chunked
    accumulation twin of miou_labels (see miou_iu_device)."""
    import jax.numpy as jnp
    return _iu_device(jnp.argmax(pred_logits, axis=-1), labels,
                      num_classes, jnp.int32)


def iu_maps_device(pred_labels, ref_labels, num_classes: int):
    """Per-class (intersection, union) counts of two ALREADY-argmaxed class
    maps (uint8/int) — the output-form twin of ``miou_iu_device`` for
    deployment loops that stack argmax maps instead of logits
    (``runner.scan_video`` ``out_map``; bench.py times both paths in that
    form, so its accuracy pass receives maps, not logits)."""
    import jax.numpy as jnp
    return _iu_device(pred_labels, ref_labels, num_classes, jnp.int32)


def merge_iu(inter: np.ndarray, union: np.ndarray) -> float:
    """Combine accumulated per-class counts into mIoU (union==0 classes are
    skipped, exactly as in `miou`)."""
    inter = np.asarray(inter, np.float64)
    union = np.asarray(union, np.float64)
    present = union > 0
    if not np.any(present):
        return 1.0
    return float(np.mean(inter[present] / union[present]))


def pck_device(pred_heatmaps, ref_heatmaps, alpha: float = 0.05):
    """jnp PCK vs dense keypoints; accepts (..., H, W, K)."""
    import jax.numpy as jnp
    *lead, H, W, K = pred_heatmaps.shape
    p = pred_heatmaps.reshape((-1, H * W, K)).argmax(axis=1)
    r = ref_heatmaps.reshape((-1, H * W, K)).argmax(axis=1)
    py, px = p // W, p % W
    ry, rx = r // W, r % W
    dist = jnp.sqrt(((py - ry) ** 2 + (px - rx) ** 2).astype(jnp.float32))
    return jnp.mean((dist <= alpha * max(H, W)).astype(jnp.float32))


def pck_gt_device(pred, packed_kps, stride: int, alpha: float = 0.05,
                  num_keypoints: int = 18):
    """jnp twin of pck_gt, one device scalar (tuner fast path).

    ``packed_kps``: (..., num_keypoints, 3) — [y, x, valid] rows, the
    tuner's single-array labels channel (kps and the valid mask packed
    together; see scripts/tune_model.py pose branch)."""
    import jax.numpy as jnp
    *lead, H, W, C = pred.shape
    heat = pred[..., C - num_keypoints:].reshape((-1, H * W, num_keypoints))
    flat = heat.argmax(axis=1)
    py, px = flat // W, flat % W
    pk = packed_kps.reshape((-1, num_keypoints, 3))
    gt = pk[..., :2] / stride
    v = pk[..., 2] > 0.5
    dist = jnp.sqrt((py - gt[..., 0]) ** 2 + (px - gt[..., 1]) ** 2)
    ok = (dist <= alpha * max(H, W)).astype(jnp.float32)
    nv = jnp.sum(v)
    # no valid keypoint => vacuous 1.0, matching the host twin pck_gt
    # (0/max(nv,1) would score 0.0 — a 100 pp twin divergence)
    return jnp.where(nv > 0,
                     jnp.sum(jnp.where(v, ok, 0.0)) / jnp.maximum(nv, 1),
                     1.0)


# --------------------------- compute accounting ------------------------------


def _row_flops_per_tile(row, tile_h: int, tile_w: int) -> int:
    if not isinstance(row.spec, ConvSpec):
        return 0
    kh, kw = row.spec.kernel
    return 2 * tile_h * tile_w * kh * kw * row.in_shape[2] \
        * row.spec.features


def layer_flops_per_tile(specs: Sequence, in_shape, tile_h: int, tile_w: int
                         ) -> List[int]:
    """MAC*2 per recomputed tile for each layer (0 for non-conv layers)."""
    from .netview import NetView
    return [_row_flops_per_tile(r, tile_h, tile_w)
            for r in NetView.from_specs(specs, in_shape).rows]


def effective_flops_view(view, stats, tile_h: int, tile_w: int
                         ) -> Dict[str, float]:
    """Aggregate per-frame effective FLOPs from scan stats — topology-
    agnostic (NetView over CBNet or CBGraphNet; stats list or dict).

    Returns dense flops, mean effective flops, and the reduction factor —
    the BASELINE.json ">=3x effective FLOP reduction" headline number.
    """
    dense_total = 0
    eff_total = 0.0
    frames = None
    for row in view.rows:
        s = view.stats_of(stats, row)
        ft = _row_flops_per_tile(row, tile_h, tile_w)
        if not s or ft == 0:
            continue
        computed = np.asarray(s["computed_tiles"], dtype=np.float64)
        n_tiles = float(np.max(np.asarray(s["n_tiles"])))
        frames = computed.shape[0] if computed.ndim else 1
        dense_total += ft * n_tiles
        eff_total += float(np.mean(computed)) * ft
    return {
        "dense_flops_per_frame": float(dense_total),
        "effective_flops_per_frame": float(eff_total),
        "flop_reduction": float(dense_total / max(eff_total, 1.0)),
        "frames": frames,
    }


def effective_flops(stats: List[Dict], specs: Sequence, in_shape,
                    tile_h: int, tile_w: int) -> Dict[str, float]:
    """Sequential-specs wrapper of effective_flops_view."""
    from .netview import NetView
    return effective_flops_view(NetView.from_specs(specs, in_shape), stats,
                                tile_h, tile_w)


# Machine balance (peak bf16 FLOP/s over peak HBM byte/s) used to price
# detection traffic in FLOP-equivalents. v5e: ~197 TFLOP/s / 0.82 TB/s
# ~= 240 flop/byte. (r2 shipped 500 — the 2x overpricing of detect traffic
# still tracked wall-clock but skewed the tuner's Pareto; VERDICT r2.)
MACHINE_BALANCE = 240.0


def effective_cost_view(view, stats, tile_h: int, tile_w: int,
                        balance: float = MACHINE_BALANCE,
                        cache_bytes: int = 2) -> Dict[str, float]:
    """Roofline-aware cost model: FLOPs + detection TRAFFIC
    (topology-agnostic over a NetView).

    `effective_flops` prices only MACs, which misprices the pipeline:
    detection is bandwidth-bound (it reads x + cache and writes the cache
    at every visited tile), so a threshold setting that recomputes little
    but forces wide detection looks great in FLOPs and terrible on the
    clock (measured r2: a tau=0 stem scored 12x FLOP reduction and 0.44x
    wall-clock). Here every visited detect tile is charged its bytes times
    the machine balance (peak bf16 FLOPs / peak HBM bandwidth;
    MACHINE_BALANCE ~240 flop/byte on v5e), converting traffic into
    FLOP-equivalents at the roofline. The result tracks wall-clock well
    enough to drive the threshold tuner's selection; the BASELINE
    'flop_reduction' headline stays pure-FLOP (effective_flops) for
    comparability.

    When ``view.cfg`` is set, detect traffic is priced at the layer's
    STORED channel width — the pallas backend lane-pads every cache to 128
    channels (layers.lane_pad), so a cin=3 stem's real HBM traffic is ~43x
    its logical bytes. Pricing logical bytes let the r2 tuner prefer a
    lane-padded CB stem whose measured wall-clock was 0.99x dense.
    """
    from .layers import HINT_TILE, lane_pad
    cfg = view.cfg
    dense_total = 0.0
    eff_total = 0.0
    for row in view.rows:
        s = view.stats_of(stats, row)
        ft = _row_flops_per_tile(row, tile_h, tile_w)
        if not s:
            continue
        n_tiles = float(np.max(np.asarray(s["n_tiles"])))
        computed = float(np.mean(np.asarray(s["computed_tiles"],
                                            np.float64)))
        dense_total += ft * n_tiles
        eff_total += computed * ft
        # detection traffic: 2 reads + <=1 write of one HINT_TILE^2 pixel
        # tile (detect_tiles counts on the fixed 8x8 hint grid, NOT the
        # compute tile grid) at the STORED channel width, in cache dtype
        cin = row.in_shape[2]
        if cfg is not None:
            import dataclasses as _dc
            eff_cfg = cfg
            if getattr(row.spec, "backend", None) is not None \
                    and row.spec.backend != cfg.backend:
                eff_cfg = _dc.replace(cfg, backend=row.spec.backend)
            cin = lane_pad(cin, eff_cfg)
        det = float(np.mean(np.asarray(s["detect_tiles"], np.float64)))
        eff_total += (det * 3 * HINT_TILE * HINT_TILE * cin
                      * cache_bytes * balance)
    return {
        "dense_flops_per_frame": float(dense_total),
        "effective_cost_per_frame": float(eff_total),
        "cost_reduction": float(dense_total / max(eff_total, 1.0)),
    }


def effective_cost(stats: List[Dict], specs: Sequence, in_shape,
                   tile_h: int, tile_w: int, balance: float = MACHINE_BALANCE,
                   cache_bytes: int = 2, cfg=None) -> Dict[str, float]:
    """Sequential-specs wrapper of effective_cost_view."""
    from .netview import NetView
    return effective_cost_view(NetView.from_specs(specs, in_shape, cfg),
                               stats, tile_h, tile_w, balance, cache_bytes)


def change_rate_histogram(stats: List[Dict]) -> List[Dict[str, float]]:
    """Per-layer mean/max changed-tile fraction over the clip [B:2]."""
    out = []
    for i, s in enumerate(stats):
        if not s:
            out.append({})
            continue
        computed = np.asarray(s["computed_tiles"], dtype=np.float64)
        n = float(np.max(np.asarray(s["n_tiles"])))
        out.append({
            "layer": i,
            "mean_fraction": float(np.mean(computed) / n),
            "max_fraction": float(np.max(computed) / n),
            "overflow_rate": float(np.mean(np.asarray(s["overflow"]))),
        })
    return out


def drift_bound(specs: Sequence, params, thresholds) -> float:
    """Analytic worst-case steady-state output drift of the CB network vs
    its dense twin, in per-channel max-abs units.

    The accepted-cache rule (arXiv 1704.04313 §3.1: the comparison
    baseline is the last ACCEPTED value) bounds each CB layer's input
    error by its threshold: any pixel whose drift exceeds tau_l is
    recomputed, so accepted per-channel drift is <= tau_l on top of
    whatever error the producer already carries. Error propagates through
    a conv as the max-over-outputs L1 norm of the kernel (ReLU and
    max-pool are 1-Lipschitz in the max norm; nearest upsample is exact):

        e_out = gain_l * (e_in + tau_l)   [conv]
        e_out = e_in + tau_l              [pool]

    The bound is loose (worst case aligns all signs) but sound — useful
    for sanity-checking a tau budget and for choosing ``refresh_every``
    (a periodic dense refresh resets e to 0). Dense layers
    (use_cb=False) contribute gain only, no tau.
    """
    from .config import PoolSpec, UpsampleSpec

    taus = list(np.asarray(thresholds, dtype=np.float64).ravel())
    ti = 0
    e = 0.0

    def next_tau():
        nonlocal ti
        if ti >= len(taus):
            raise ValueError(
                f"{len(taus)} thresholds for >{ti} CB layers")
        t = max(0.0, taus[ti])
        ti += 1
        return t

    for spec, p in zip(specs, params):
        if isinstance(spec, ConvSpec):
            w = np.asarray(p[0], dtype=np.float64)  # (kh, kw, cin, cout)
            gain = float(np.abs(w).sum(axis=(0, 1, 2)).max())
            tau = next_tau() if spec.use_cb else 0.0
            e = gain * (e + tau)
        elif isinstance(spec, PoolSpec):
            e = e + (next_tau() if spec.use_cb else 0.0)
        elif isinstance(spec, UpsampleSpec):
            pass
        else:
            raise ValueError(f"drift_bound: unsupported spec {spec}")
    if ti != len(taus):
        raise ValueError(f"{len(taus)} thresholds for {ti} CB layers")
    return float(e)
