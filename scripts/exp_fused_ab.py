"""Same-process interleaved A/B: fused consumer-detect ON vs OFF.

Single-config probes of the fused delta-conv+detect path landed within
the per-process run variance (pose probes swing ±5% across identical
configs), so the adoption decision needs the EXP_tau_ab instrument: both
variants compiled in ONE process, timed over the SAME device-resident
chunks in interleaved reps, medians compared. CB state is re-warmed per
rep (refresh-prolog first chunk) so both variants see identical work.

Usage: python scripts/exp_fused_ab.py [model] [reps]
Prints one JSON line {model, fused_ms, unfused_ms, fused_fps,
unfused_fps, speedup, fused_layers}.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def strip_fused(net):
    """Return the same net with every fuse_next_detect flag cleared."""
    from cbinfer_tpu.config import ConvSpec
    if hasattr(net, "nodes"):  # CBGraphNet
        nodes = tuple(
            dataclasses.replace(
                n, spec=dataclasses.replace(n.spec, fuse_next_detect=False))
            if isinstance(n.spec, ConvSpec) else n for n in net.nodes)
        return dataclasses.replace(net, nodes=nodes)
    specs = tuple(
        dataclasses.replace(s, fuse_next_detect=False)
        if isinstance(s, ConvSpec) else s for s in net.specs)
    return dataclasses.replace(net, specs=specs)


def with_fused(net):
    """Opt the net INTO fused consumer-detect (the converters default to
    off per this experiment's result): apply the shared static gate
    (layers.fuse_next_gate) over the already-converted specs (sequential
    nets only)."""
    from cbinfer_tpu.layers import fuse_next_gate
    from cbinfer_tpu.netview import NetView
    assert not hasattr(net, "nodes"), "sequential A/B only"
    view = NetView.from_specs(net.specs, net.in_shape, net.cfg)
    specs = list(net.specs)
    for i in range(len(specs) - 1):
        if fuse_next_gate(specs[i], specs[i + 1], view.rows[i].in_shape,
                          net.cfg):
            specs[i] = dataclasses.replace(specs[i], fuse_next_detect=True)
    return dataclasses.replace(net, specs=tuple(specs))


def count_fused(net):
    specs = ([n.spec for n in net.nodes] if hasattr(net, "nodes")
             else net.specs)
    return sum(1 for s in specs if getattr(s, "fuse_next_detect", False))


def main():
    # disabled HERE, not at module level: check_fused_parity_tpu.py imports
    # this module for strip_fused/with_fused and relies on the persistent
    # cache (review r3). For the A/B itself the cache must be off — its
    # key may not distinguish the variants' programs reliably across runs.
    jax.config.update("jax_enable_compilation_cache", False)

    from cbinfer_tpu import zoo
    from cbinfer_tpu.benchmark import devices_or_die, measure_sync_overhead
    from cbinfer_tpu.runner import scan_video
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig

    name = sys.argv[1] if len(sys.argv) > 1 else "pose"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    H, W = 720, 1280
    T, CHUNKS = 32, 6
    if not any(d.platform == "tpu" for d in devices_or_die()):
        print(json.dumps({"model": name, "error": "not on TPU"}))
        return 1
    sync_overhead = measure_sync_overhead()

    wl = zoo.load(name, (H, W, 3))
    params = wl.params
    if name == "pose_graph":
        # DAG twin: rebuild both arms through the graph converter's own
        # fuse pass (with_fused's sequential-gate walk doesn't know DAG
        # reader topology; convert_graph_flagship does)
        from cbinfer_tpu.graph import convert_graph_flagship
        from cbinfer_tpu.zoo import default_pipeline_config
        cfg = default_pipeline_config()
        net_u = convert_graph_flagship(list(wl.specs), (H, W, 3), cfg,
                                       output=wl.net.output,
                                       fuse_detect=False)
        net_f = convert_graph_flagship(list(wl.specs), (H, W, 3), cfg,
                                       output=wl.net.output,
                                       fuse_detect=True)
    else:
        net_u = strip_fused(wl.net)
        net_f = with_fused(net_u)
    nf = count_fused(net_f)
    assert nf > 0, f"{name}: no fused layers — nothing to A/B"
    tv = jnp.asarray(wl.taus, jnp.float32)
    out_u8 = (None if name.startswith("pose")
              else (lambda y: jnp.argmax(y, -1).astype(jnp.uint8)))

    run_seed = int(time.time() * 1e3) % 100000
    video = SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=4, sprite_size=48, speed=4.0,
        noise_std=0.002, seed=run_seed))
    chunks = [jnp.asarray(video.clip(T)) for _ in range(CHUNKS)]
    for ch in chunks:
        _ = float(jnp.sum(ch))

    def make(net):
        fr = jax.jit(
            lambda p, fs, st: scan_video(net, p, fs, state=st,
                                         thresholds=tv, refresh_start=True,
                                         out_map=out_u8,
                                         collect_stats="mean", ingest=False),
            donate_argnums=(2,))
        fp = jax.jit(
            lambda p, fs, st: scan_video(net, p, fs, state=st,
                                         thresholds=tv, out_map=out_u8,
                                         collect_stats="mean", ingest=False),
            donate_argnums=(2,))
        return net, fr, fp

    variants = {"fused": make(net_f), "unfused": make(net_u)}
    # compile + one full warm pass each
    for net, fr, fp in variants.values():
        ys, st, _ = fr(params, chunks[0], net.init_state())
        _ = float(jnp.sum(ys[-1]))
        ys, st, _ = fp(params, chunks[1], st)
        _ = float(jnp.sum(ys[-1]))

    times = {k: [] for k in variants}
    for r in range(reps):
        for k, (net, fr, fp) in variants.items():
            st = net.init_state()
            ys, st, _ = fr(params, chunks[0], st)
            _ = float(jnp.sum(ys[-1]))  # warm state, untimed
            t0 = time.perf_counter()
            for ch in chunks[1:]:
                ys, st, _ = fp(params, ch, st)
            _ = float(jnp.sum(ys[-1]))
            times[k].append(time.perf_counter() - t0 - sync_overhead)

    n_frames = (CHUNKS - 1) * T
    med = {k: float(np.median(v)) for k, v in times.items()}
    print(json.dumps({
        "model": name,
        "fused_layers": nf,
        "reps": reps,
        "fused_ms": round(1e3 * med["fused"] / n_frames, 4),
        "unfused_ms": round(1e3 * med["unfused"] / n_frames, 4),
        "fused_fps": round(n_frames / med["fused"], 1),
        "unfused_fps": round(n_frames / med["unfused"], 1),
        "speedup": round(med["unfused"] / med["fused"], 4),
        "all_fused_s": [round(v, 4) for v in times["fused"]],
        "all_unfused_s": [round(v, 4) for v in times["unfused"]],
        "seed": run_seed,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
