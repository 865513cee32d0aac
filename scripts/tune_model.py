"""Tune per-layer thresholds for a 720p model on the chip (C13).

Runs the auto-tuner at the BASELINE accuracy budget (<=0.5% metric drop,
budget=0.005) on a calibration clip DISJOINT from the benchmark video
(different seed), persists the chosen tau vector + refresh interval to
ckpts/<model>_tau.json (bench.py / eval_headline.py load it), and writes
the full Pareto curve to TUNE_<model>.json.

pose (configs[3], the reference paper's §V tuning workload) tunes at
360p with in-repo-TRAINED weights (scripts/train_pose.py, synthetic
keypoint supervision) against GROUND-TRUTH PCK — same budget semantics
as seg's mIoU (<=0.5% degradation), closing VERDICT r2 missing #1.

Usage: python scripts/tune_model.py [scene|seg|pose] [budget]
       python scripts/tune_model.py pose --stress-only
           re-run ONLY the deployment stress validation (+ fallback
           selection + tau-file save) against the CURRENT tuned vector
           from ckpts/<model>_tau.json's tuner record — the cheap path
           when the horizon/validation rules change but the sweep's
           relative profile is still good (r5: the 192-frame horizon).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# registry (paths/widths) lives in cbinfer_tpu/zoo.py — one source of
# truth shared with bench/eval/optimize_policy
from cbinfer_tpu import zoo


def main():
    from cbinfer_tpu.config import PipelineConfig, TileConfig
    from cbinfer_tpu.convert import convert_flagship
    from cbinfer_tpu.checkpoint import load_npz_params, save_thresholds
    from cbinfer_tpu.metrics import miou_labels, miou_labels_device
    from cbinfer_tpu.models import get_model
    from cbinfer_tpu.network import init_params, out_shapes
    from cbinfer_tpu.tuner import tune
    from cbinfer_tpu.video import (SpriteVideo, SpriteVideoConfig,
                                   workload_video_kwargs)

    stress_only = "--stress-only" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0] if args else "scene"
    budget = float(args[1]) if len(args) > 1 else 0.005

    class _PriorTune:
        """--stress-only stand-in for a fresh tuner result: the last
        sweep's RAW vector (the stress record's 'tuned' row) + metadata
        from the saved tau file."""

        def __init__(self, tau_json_path):
            import json as _json
            with open(tau_json_path) as f:
                d = _json.load(f)
            md = d.get("metadata", {})
            rows = (md.get("stress_validation") or {}).get("rows") or []
            tuned = next((r["thresholds"] for r in rows
                          if r.get("name") == "tuned"), None)
            self.thresholds = tuned or d["thresholds"]
            self.metric = md.get("metric", float("nan"))
            self.flop_reduction = md.get("flop_reduction", float("nan"))
    e = zoo.REGISTRY[name]
    width, npz, tau_json = e.width, e.npz, e.tau_json
    NUM_CLASSES = 8

    # T=192: the calibration horizon must cover STEADY-STATE drift AND
    # one full illumination cycle of the graded distribution
    # (video.GRADED_DYNAMICS light_period=192). r5 measured the failure
    # mode of a shorter horizon directly: pose tuned at T=64 passed a
    # 48-frame stress gate with worst degradation 0.0, then measured
    # 0.014-0.17 worst-chunk GT degradation on the 144-frame
    # validate_refresh horizon — the light cycle's extreme delivers
    # ~0.1*lum of drift that a tau=0.1 entry legitimately ACCEPTS, so
    # no refresh cadence can bound it; only a horizon that SEES the
    # extreme prices large taus correctly.
    H, W, T = 720, 1280, 192
    if name.startswith("pose"):
        # Tune AT deployment resolution (r4). The r3 360p sweep saturated
        # its grid (flat sensitivity curves at 360p pushed most layers to
        # 0.15) and the resulting vector degraded GT-PCK 0.125 at 720p —
        # stress_validate correctly rejected it and pose shipped flat tau
        # (VERDICT r3 missing #3). At 720p each eval measures the real
        # deployment operating point; the graded light cycle (192
        # frames) sets the floor on T — see the module comment above.
        T = 192
    from cbinfer_tpu.benchmark import devices_or_die  # bounded: tunnel can hang
    on_tpu = any(d.platform == "tpu" for d in devices_or_die())
    backend = "pallas" if on_tpu else "jnp"

    cfg = PipelineConfig(
        tile=TileConfig(tile_h=8, tile_w=8, capacity_fraction=0.375),
        backend=backend,
        compute_dtype="bfloat16" if on_tpu else "float32",
        cache_dtype="bfloat16" if on_tpu else "float32")
    if name == "pose_graph":
        from cbinfer_tpu.checkpoint import load_npz_graph_params
        from cbinfer_tpu.graph import (convert_graph_flagship,
                                       init_graph_params, node_out_shapes)
        from cbinfer_tpu.models.pose import pose_graph
        import jax as _jax
        nodes, out_name = pose_graph(width=width)
        net = convert_graph_flagship(nodes, (H, W, 3), cfg, output=out_name)
        params = init_graph_params(nodes, (H, W, 3), _jax.random.PRNGKey(0))
        params = load_npz_graph_params(npz, params)
        oh = node_out_shapes(nodes, (H, W, 3))[out_name][0]
        stride = H // oh
        specs = None
    else:
        base = name[:-5] if name.endswith("_hard") else name
        specs = (get_model(base, width=width) if base == "pose"
                 else get_model(base, num_classes=NUM_CLASSES, width=width))
        # Calibrate at the PRE-upsample grid: a trailing nearest-neighbor
        # upsample is argmax-transparent (the stride-s class map determines
        # the upsampled one) and has no threshold, but its full-res
        # 8-channel logits stack is lane-padded 16x by XLA (22.6 GB for 96
        # frames at 720p — OOM'd the chip). Thresholds transfer.
        from cbinfer_tpu.config import UpsampleSpec
        if isinstance(specs[-1], UpsampleSpec):
            specs = specs[:-1]
        net = convert_flagship(specs, (H, W, 3), cfg)
        params = init_params(specs, (H, W, 3), jax.random.PRNGKey(0))
        if npz is not None:
            params = load_npz_params(npz, params)

    # calibration SET: two clips, seeds disjoint from the bench video
    # (single-clip calibration is noisy at the 0.5% budget scale), WITH
    # ground truth: class labels at the output stride (scene/seg) or packed
    # keypoints [y, x, valid] (pose; distinct_classes keeps per-channel
    # argmax PCK well-defined — video.py module doc)
    if specs is not None:
        oh = out_shapes(specs, (H, W, 3))[-1][0]
        stride = H // oh
    vk = workload_video_kwargs(name)
    if name.startswith("pose"):
        vids = [SpriteVideo(SpriteVideoConfig(
            height=H, width=W, n_sprites=4, sprite_size=max(24, H // 15),
            speed=4.0, noise_std=0.002, distinct_classes=True, seed=s,
            **vk)).clip_with_keypoints(T) for s in (7, 11)]
        calib = jnp.stack([jnp.asarray(f) for f, _, _ in vids])
        labels = jnp.stack([
            jnp.asarray(np.concatenate(
                [k, v[..., None].astype(np.float32)], axis=-1))
            for _, k, v in vids])
    else:
        pairs = [SpriteVideo(SpriteVideoConfig(
            height=H, width=W, n_sprites=4, sprite_size=max(24, H // 15),
            speed=4.0, noise_std=0.002, seed=s,
            **vk)).clip_with_labels(T) for s in (7, 11)]
        calib = jnp.stack([jnp.asarray(f) for f, _ in pairs])
        labels = jnp.stack([jnp.asarray(l[:, ::stride, ::stride])
                            for _, l in pairs])

    # The budget is GROUND-TRUTH degradation: 1 - metric = mIoU_gt(dense)
    # - mIoU_gt(cb), the BASELINE "mIoU delta vs full-frame". Agreement
    # mIoU (cb argmax vs dense argmax) is fp-noise-bound at ~0.99 on this
    # hardware (see metrics.miou_labels) and would burn the whole budget
    # on implementation rounding, not on CBinfer's approximation.
    def gt_metric(cb, dn, lab):
        return 1.0 - (miou_labels(dn, lab, NUM_CLASSES)
                      - miou_labels(cb, lab, NUM_CLASSES))

    def gt_metric_device(cb, dn, lab):
        return 1.0 - (miou_labels_device(dn, lab, NUM_CLASSES)
                      - miou_labels_device(cb, lab, NUM_CLASSES))

    # Deployment runs with a periodic full refresh (runner.scan_video
    # refresh_every): it bounds worst-case cache staleness to K frames for
    # one dense-equivalent frame per K, which is what makes <=0.5%
    # achievable at steady state. Calibrate under the same policy.
    # Grid note: 0.01 sits below the bf16-cache-quantization + sensor-noise
    # floor (full-map changes, no gain) — measured r2.
    REFRESH = 32
    if name.startswith("pose"):
        # GROUND-TRUTH PCK degradation (trained weights, synthetic keypoint
        # supervision — train_pose): budget semantics identical to seg's
        # mIoU budget. The r2 agreement-PCK-of-a-random-net workaround and
        # its 0.08 fp-noise budget are gone (VERDICT r2 missing #1).
        from cbinfer_tpu.metrics import pck_gt, pck_gt_device

        def pose_metric(cb, dn, lab):
            lab = np.asarray(lab).reshape(-1, lab.shape[-2], 3)
            kps, valid = lab[..., :2], lab[..., 2] > 0.5
            return 1.0 - (pck_gt(np.asarray(dn), kps, valid, stride)
                          - pck_gt(np.asarray(cb), kps, valid, stride))

        def pose_metric_device(cb, dn, lab):
            return 1.0 - (pck_gt_device(dn, lab, stride)
                          - pck_gt_device(cb, lab, stride))

        if stress_only:
            res = _PriorTune(tau_json)
        else:
            res = tune(net, params, calib, pose_metric,
                       device_metric_fn=pose_metric_device, labels=labels,
                       # trimmed grid, capped at 0.1: the 360p sweep
                       # saturated at 0.15 and that end of the grid is
                       # where the deployment fragility lived
                       tau_grid=(0.02, 0.03, 0.045, 0.07, 0.1),
                       budgets=(0.001, 0.002, 0.005, 0.01, 0.02),
                       budget=budget, skip_frames=8,
                       refresh_every=REFRESH, verbose=True)
    else:
        if stress_only:
            res = _PriorTune(tau_json)
        else:
            res = tune(net, params, calib, gt_metric,
                       device_metric_fn=gt_metric_device, labels=labels,
                       tau_grid=(0.015, 0.02, 0.03, 0.045, 0.07, 0.1,
                                 0.15),
                       budgets=(0.001, 0.002, 0.005, 0.01, 0.02),
                       budget=budget, skip_frames=8,
                       refresh_every=REFRESH, verbose=True)

    print(f"selected taus: {res.thresholds}")
    print(f"calib metric {res.metric:.5f}  "
          f"flop reduction {res.flop_reduction:.2f}x")

    # ---- deployment-point stress validation (tuner.stress_validate) ----
    # The tuner's vector is only measured-valid AT the calibration point
    # (its seeds; 360p for pose). r3 shipped a 360p pose vector that
    # measured 0.125 GT-PCK degradation at 720p on a fresh seed
    # (POSE_ACC.json) — this stage catches that before the vector ships:
    # the tuned vector and flat fallbacks (descending tau, cheapest-safe
    # wins) are measured on fresh seeds at 720p; the first within budget
    # is what gets saved.
    from cbinfer_tpu.tuner import stress_validate
    # DT covers a full light cycle (the r5 horizon lesson above)
    DH, DW, DT = 720, 1280, 192
    if (H, W) != (DH, DW):
        if name == "pose_graph":
            dep_net = convert_graph_flagship(nodes, (DH, DW, 3), cfg,
                                             output=out_name)
        else:
            dep_net = convert_flagship(specs, (DH, DW, 3), cfg)
    else:
        dep_net = net
    cands = {"tuned": list(res.thresholds)}
    # scaled-tuned fallbacks: keep the tuner's RELATIVE per-layer profile
    # but shrink the scale — if the raw vector proves fragile on fresh
    # seeds, a 0.7x/0.5x version often passes while preserving most of
    # the non-uniform gain (cheaper than falling all the way to flat)
    for s in (0.7, 0.5):
        cands[f"tuned_x{s}"] = [float(t) * s for t in res.thresholds]
    tmax = max(res.thresholds)
    for t in (0.07, 0.045, 0.03, 0.02, 0.015):
        if t < tmax:
            cands[f"flat{t}"] = [t] * len(res.thresholds)
    if name.startswith("pose"):
        vids = [SpriteVideo(SpriteVideoConfig(
            height=DH, width=DW, n_sprites=4, sprite_size=max(24, DH // 15),
            speed=4.0, noise_std=0.002, distinct_classes=True, seed=s,
            **vk)).clip_with_keypoints(DT) for s in (101, 203)]
        # LISTS of host arrays: stress_validate stages one 192-frame
        # 720p clip (~2.1 GB f32) at a time (clip-major loop; a stacked
        # device-resident pair OOM'd the chip, r5)
        vclips = [f for f, _, _ in vids]
        vlabels = [np.concatenate(
            [k, v[..., None].astype(np.float32)], axis=-1)
            for _, k, v in vids]
        stress = stress_validate(dep_net, params, cands, vclips,
                                 metric_fn=pose_metric, labels=vlabels,
                                 device_metric_fn=pose_metric_device,
                                 budget=budget, skip_frames=8,
                                 refresh_every=REFRESH, verbose=True)
    else:
        vpairs = [SpriteVideo(SpriteVideoConfig(
            height=DH, width=DW, n_sprites=4, sprite_size=max(24, DH // 15),
            speed=4.0, noise_std=0.002, seed=s,
            **vk)).clip_with_labels(DT) for s in (101, 203)]
        # host-side lists (see the pose branch note)
        vclips = [f for f, _ in vpairs]
        vlabels = [l[:, ::stride, ::stride] for _, l in vpairs]
        stress = stress_validate(dep_net, params, cands, vclips,
                                 metric_fn=gt_metric, labels=vlabels,
                                 device_metric_fn=gt_metric_device,
                                 budget=budget, skip_frames=8,
                                 refresh_every=REFRESH, verbose=True)
    if stress.source != "tuned":
        print(f"WARNING: tuned vector FAILED deployment stress "
              f"validation; shipping {stress.source} instead "
              f"(worst degradation "
              f"{stress.rows[0]['worst_degradation']:.5f} tuned vs "
              f"budget {budget})")
    if not stress.passed:
        print("WARNING: NO candidate met the budget at deployment; "
              "shipping the least-degrading one — re-tune with a finer "
              "grid or raise the budget deliberately.")
    final_taus = stress.thresholds

    save_thresholds(tau_json, final_taus,
                    metadata={"budget": budget, "metric": res.metric,
                              "stress_validation": {
                                  "resolution": f"{DH}x{DW}", "T": DT,
                                  "seeds": [101, 203],
                                  "source": stress.source,
                                  "passed": stress.passed,
                                  "rows": stress.rows},
                              "metric_def": ("1 - (pck_gt(dense) - "
                                             "pck_gt(cb)); gt = sprite "
                                             "keypoints (trained weights)"
                                             if name.startswith("pose")
                                             else
                                             "1 - (miou_gt(dense) - "
                                             "miou_gt(cb)); gt = sprite "
                                             "labels at output stride"),
                              "resolution": f"{H}x{W}",
                              "flop_reduction": res.flop_reduction,
                              "calib": f"sprites seeds 7+11 T={T} {H}x{W}",
                              "refresh_every": REFRESH,
                              "weights": npz})
    if not stress_only:
        with open(f"/root/repo/TUNE_{name}.json", "w") as f:
            f.write(res.to_json())
    print(f"wrote {tau_json}" + ("" if stress_only
                                 else f" and TUNE_{name}.json"))


if __name__ == "__main__":
    sys.exit(main())
