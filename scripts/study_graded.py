"""CPU study: does the graded-change distribution make detection non-binary?

The r4 verdict's top finding: on the benign sprite distribution every tau
in [0.02, 0.15] detects the IDENTICAL tile set (sprite deltas ~0.85 vs
0.002 noise), so the threshold knob — the reference's headline
contribution (CB19 §V) — trades nothing on 3 of 4 workloads. This script
measures, on CPU at reduced resolution, per-layer mean changed-tile
counts and ground-truth mIoU across the tau grid on (a) the benign
distribution and (b) video.GRADED_DYNAMICS, to calibrate the graded
amplitudes before any TPU retraining. Success = tile counts that move
monotonically and materially with tau on (b).

Usage: python scripts/study_graded.py [H W T] (default 240 320 48)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from cbinfer_tpu import zoo
    from cbinfer_tpu.config import PipelineConfig, TileConfig, UpsampleSpec
    from cbinfer_tpu.checkpoint import load_npz_params
    from cbinfer_tpu.convert import convert_flagship, num_cb_layers
    from cbinfer_tpu.metrics import miou_labels
    from cbinfer_tpu.models import get_model
    from cbinfer_tpu.network import init_params, out_shapes
    from cbinfer_tpu.runner import scan_video
    from cbinfer_tpu.video import (GRADED_DYNAMICS, SpriteVideo,
                                   SpriteVideoConfig)

    H = int(sys.argv[1]) if len(sys.argv) > 1 else 240
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 48
    NUM_CLASSES = 8

    cfg = PipelineConfig(tile=TileConfig(8, 8, capacity_fraction=0.375),
                         backend="jnp")

    def build(model, width, npz):
        specs = get_model(model, num_classes=NUM_CLASSES, width=width)
        if isinstance(specs[-1], UpsampleSpec):
            specs = specs[:-1]
        net = convert_flagship(specs, (H, W, 3), cfg)
        params = init_params(specs, (H, W, 3), jax.random.PRNGKey(0))
        params = load_npz_params(npz, params)
        oh = out_shapes(specs, (H, W, 3))[-1][0]
        return net, params, H // oh, num_cb_layers(net.specs)

    base = dict(height=H, width=W, n_sprites=4,
                sprite_size=max(16, H // 15), speed=4.0, noise_std=0.002,
                seed=5)
    # third arm: hard palette + graded dynamics, scored with the
    # hard-palette-TRAINED scene_hard weights — a no-retrain preview of
    # whether the combined distribution bends the ACCURACY axis too
    # (scene_hard's margins are ~0.14, so tau-scale drift flips argmaxes)
    arms = {
        "benign": (base, "seg"),
        "graded": ({**base, **GRADED_DYNAMICS}, "seg"),
        "graded_hard": ({**base, **GRADED_DYNAMICS, "palette": "hard"},
                        "scene_hard"),
    }
    taus = (0.015, 0.02, 0.03, 0.045, 0.07, 0.1, 0.15)

    out = {"H": H, "W": W, "T": T, "graded": GRADED_DYNAMICS, "arms": {}}
    for arm, (vk, wlname) in arms.items():
        e = zoo.REGISTRY[wlname]
        net, params, stride, n_cb = build(
            "scene" if wlname.startswith("scene") else wlname,
            e.width, e.npz)
        run = jax.jit(lambda p, fs, tv: scan_video(
            net, p, fs, thresholds=tv, refresh_every=32,
            collect_stats="mean"))
        video = SpriteVideo(SpriteVideoConfig(**vk))
        frames, labels = video.clip_with_labels(T)
        clip = jnp.asarray(frames)
        lab = labels[:, ::stride, ::stride]
        dense = np.asarray(
            jax.jit(lambda p, fs: jax.lax.map(
                lambda x: net.apply_dense(p, x), fs))(params, clip))
        d_miou = miou_labels(np.argmax(dense[8:], -1), lab[8:], NUM_CLASSES)
        rows = []
        for tau in taus:
            tv = jnp.full((n_cb,), tau, jnp.float32)
            ys, _, stats = run(params, clip, tv)
            cb_miou = miou_labels(np.argmax(np.asarray(ys)[8:], -1),
                                  lab[8:], NUM_CLASSES)
            per_layer = [round(float(np.asarray(s["changed_tiles"])), 1)
                         for s in stats if s]  # dense layers report {}
            rows.append({"tau": tau,
                         "gt_miou_cb": round(float(cb_miou), 4),
                         "degradation": round(float(d_miou - cb_miou), 4),
                         "mean_changed_tiles": per_layer})
            print(f"{arm:6s} tau={tau:<5} deg={d_miou - cb_miou:+.4f} "
                  f"tiles={per_layer}", flush=True)
        out["arms"][arm] = {"gt_miou_dense": round(float(d_miou), 4),
                            "rows": rows}

    # headline judgment: the tau->tiles curve must BEND on graded
    for arm in arms:
        rows = out["arms"][arm]["rows"]
        lo = sum(rows[0]["mean_changed_tiles"])
        hi = sum(rows[-1]["mean_changed_tiles"])
        out["arms"][arm]["tiles_ratio_lo_over_hi"] = round(lo / max(hi, 1e-9), 3)
        print(f"{arm}: total tiles tau={rows[0]['tau']} -> {lo:.0f}, "
              f"tau={rows[-1]['tau']} -> {hi:.0f} (ratio {lo / max(hi, 1e-9):.2f}x)")

    with open("/root/repo/STUDY_graded.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote STUDY_graded.json")


if __name__ == "__main__":
    sys.exit(main())
