"""Same-process interleaved A/B: pointwise conv as lax.conv vs matmul.

The flagship's trailing 1x1 classifier runs densely every frame on the
producer's padded storage. xprof (r4, shipped form) shows the lax.conv
lowering pays a ~21 us/frame input layout copy (copy.66) beside the
42 us conv fusion at 720p scene — a 1x1 stride-1 conv is exactly
(H*W, cin) @ (cin, cout), and the matmul form reads the storage
directly (minor-dim-preserving reshape). network.POINTWISE_DOT is the
trace-time gate, scoped to convert.dense_conv_on_feature (the CB
path's dense trailing layers) — the dense baseline
(network.dense_conv) does NOT read it, so the dense arms compile
identical programs and dense_speedup_dot_vs_conv is a noise floor for
the measurement, not a signal.

Usage: python scripts/exp_pointwise_ab.py [model] [reps]
Writes EXP_pointwise_ab.json (per-model sections).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_enable_compilation_cache", False)

    from cbinfer_tpu import network, zoo
    from cbinfer_tpu.benchmark import devices_or_die, measure_sync_overhead
    from cbinfer_tpu.runner import scan_video
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig

    name = sys.argv[1] if len(sys.argv) > 1 else "scene"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    H, W, CHUNKS = 720, 1280, 6
    T = 12 if name.startswith("pose") else 32
    if not any(d.platform == "tpu" for d in devices_or_die()):
        print(json.dumps({"error": "not on TPU"}))
        return 1
    sync_overhead = measure_sync_overhead()

    wl = zoo.load(name, (H, W, 3))
    tv = jnp.asarray(wl.taus, jnp.float32)
    out_u8 = (None if name.startswith("pose")
              else (lambda y: jnp.argmax(y, -1).astype(jnp.uint8)))

    run_seed = int(time.time() * 1e3) % 100000
    video = SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=4, sprite_size=48, speed=4.0,
        noise_std=0.002, distinct_classes=name.startswith("pose"),
        seed=run_seed))
    chunks = [jnp.asarray(video.clip(T)) for _ in range(CHUNKS)]
    for ch in chunks:
        _ = float(jnp.sum(ch))

    def build(dot: bool):
        """Trace both executables UNDER the flag value (trace-time gate)."""
        network.POINTWISE_DOT = dot
        fr = jax.jit(
            lambda p, fs, st: scan_video(wl.net, p, fs, state=st,
                                         thresholds=tv, refresh_start=True,
                                         out_map=out_u8,
                                         collect_stats=False)[:2],
            donate_argnums=(2,))
        fp = jax.jit(
            lambda p, fs, st: scan_video(wl.net, p, fs, state=st,
                                         thresholds=tv, out_map=out_u8,
                                         collect_stats=False)[:2],
            donate_argnums=(2,))
        dn = jax.jit(lambda p, fs: jax.lax.map(
            lambda x: (out_u8 or (lambda y: y))(
                wl.net.apply_dense(p, x)), fs))
        # warm/trace NOW, while the flag holds this value
        ys, st = fr(wl.params, chunks[0], wl.net.init_state())
        _ = float(jnp.sum(ys[-1]))
        ys, st = fp(wl.params, chunks[1], st)
        _ = float(jnp.sum(ys[-1]))
        d = dn(wl.params, chunks[0])
        _ = float(jnp.sum(d[-1]))
        return fr, fp, dn

    orig_dot = network.POINTWISE_DOT
    try:
        arms = {"conv": build(False), "dot": build(True)}
    finally:
        network.POINTWISE_DOT = orig_dot  # restore the shipped default

    cb_times = {k: [] for k in arms}
    dn_times = {k: [] for k in arms}
    for r in range(reps):
        for k, (fr, fp, dn) in arms.items():
            st = wl.net.init_state()
            ys, st = fr(wl.params, chunks[0], st)
            _ = float(jnp.sum(ys[-1]))
            t0 = time.perf_counter()
            for ch in chunks[1:]:
                ys, st = fp(wl.params, ch, st)
            _ = float(jnp.sum(ys[-1]))
            cb_times[k].append(time.perf_counter() - t0 - sync_overhead)
            t0 = time.perf_counter()
            for ch in chunks[1:]:
                d = dn(wl.params, ch)
            _ = float(jnp.sum(d[-1]))
            dn_times[k].append(time.perf_counter() - t0 - sync_overhead)

    n_frames = (CHUNKS - 1) * T
    med = {k: float(np.median(v)) for k, v in cb_times.items()}
    dmed = {k: float(np.median(v)) for k, v in dn_times.items()}
    row = {
        "model": name, "reps": reps, "seed": run_seed,
        "cb_ms_per_frame": {k: round(1e3 * m / n_frames, 4)
                            for k, m in med.items()},
        "dense_ms_per_frame": {k: round(1e3 * m / n_frames, 4)
                               for k, m in dmed.items()},
        "cb_speedup_dot_vs_conv": round(med["conv"] / med["dot"], 4),
        "dense_speedup_dot_vs_conv": round(dmed["conv"] / dmed["dot"], 4),
        "all_cb_s": {k: [round(x, 4) for x in v]
                     for k, v in cb_times.items()},
    }
    print(json.dumps(row), flush=True)
    path = "/root/repo/EXP_pointwise_ab.json"
    out = {"experiment": __doc__.split("\n")[0], "models": {}}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
        out.setdefault("models", {})
    out["models"][name] = row
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
