"""Measured per-layer backend policy optimizer (VERDICT r2 lever 2c).

For deep nets the per-layer CB bookkeeping (detect/compact/gather/scatter)
can exceed the cost of just recomputing the layer densely from its accepted
cache: ``dense_cached`` keeps the exact tau semantics and the hint chain
but has zero sparse machinery, so on small low-res maps it can be the
faster mode (the papers make the same per-layer dense/CB choice —
arXiv 1808.05488 §VI; SURVEY.md §7 "stage-wise ... cheap layers may not
be worth caching").

This script decides the flip EMPIRICALLY, end-to-end: greedy over conv
layers (deepest first — bookkeeping-bound layers live at low resolution),
flipping a layer to dense_cached iff the measured steady-state fps of the
WHOLE network improves by >= --min-gain. Accuracy is unchanged by
construction: dense_cached recomputes a superset (everything) of the CB
mask from the same accepted cache, and out_cache == f(in_cache) holds for
both modes (golden.py invariant), so the tuned tau file stays valid.

Writes POLICY_{model}.json: accepted overrides + before/after fps.
Sequential models key overrides by spec INDEX (convert_flagship
extra_overrides); pose_graph keys by node NAME (convert_graph_flagship).
Usage: python scripts/optimize_policy.py [scene|seg|pose|pose_graph]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # The axon sitecustomize shim registers the TPU platform regardless of
    # the env var; forcing via config BEFORE any device query is the only
    # reliable way to run on CPU (and not hang when the tunnel is down).
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cbinfer_tpu import zoo
from cbinfer_tpu.config import ConvSpec, PipelineConfig, TileConfig
from cbinfer_tpu.convert import convert_flagship
from cbinfer_tpu.runner import scan_video
from cbinfer_tpu.video import (SpriteVideo, SpriteVideoConfig,
                               workload_video_kwargs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", nargs="?", default="pose",
                    choices=tuple(zoo.names()))
    ap.add_argument("--h", type=int, default=720)
    ap.add_argument("--w", type=int, default=1280)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--chunks", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3,
                    help="timed windows per trial; the MEDIAN decides "
                    "(tunnel RTT jitter swings short windows ±20%%)")
    ap.add_argument("--min-gain", type=float, default=0.03,
                    help="relative fps gain required to accept a flip "
                    "(must exceed residual window-to-window noise)")
    ap.add_argument("--max-layers", type=int, default=None,
                    help="try only the N deepest candidate layers (each "
                    "trial recompiles the whole net; deep low-res layers "
                    "are where dense_cached wins live)")
    args = ap.parse_args()

    from cbinfer_tpu.benchmark import devices_or_die, measure_sync_overhead

    on_tpu = any(d.platform == "tpu" for d in devices_or_die())
    H, W, T = args.h, args.w, args.frames
    cfg = PipelineConfig(
        # capacity 0.375 = bench.py/tune_model.py parity: the policy must
        # be measured in the same overflow/buffer regime that consumes it
        tile=TileConfig(8, 8, capacity_fraction=0.375),
        backend="pallas" if on_tpu else "jnp",
        compute_dtype="bfloat16" if on_tpu else "float32",
        cache_dtype="bfloat16" if on_tpu else "float32")

    # zoo gives architecture + trained weights + tuned taus in one call;
    # apply_policy=False — THIS script is what writes the policy
    wl = zoo.load(args.model, (H, W, 3), cfg, apply_policy=False)
    for wmsg in wl.warnings:
        print(f"WARNING: {wmsg}", file=sys.stderr)
    params, base_net = wl.params, wl.net
    if wl.kind == "graph":
        from cbinfer_tpu.graph import convert_graph_flagship

        def make_net(extra):
            return convert_graph_flagship(
                wl.specs, (H, W, 3), cfg, output=base_net.output,
                extra_overrides=extra or None)
        # candidate keys: CB conv NODES the flagship policy left on the
        # default backend, deepest (latest in topo order) first
        convs = [n.name for n in reversed(base_net.nodes)
                 if isinstance(n.spec, ConvSpec) and n.spec.use_cb
                 and n.spec.backend is None]
    else:
        def make_net(extra):
            return convert_flagship(wl.specs, (H, W, 3), cfg,
                                    extra_overrides=extra or None)
        convs = [i for i, s in enumerate(base_net.specs)
                 if isinstance(s, ConvSpec) and s.use_cb
                 and s.backend is None]  # skip stem + dense tail
        convs.sort(reverse=True)  # deepest first: low-res = bookkeeping
    taus = jnp.asarray(wl.taus, jnp.float32)

    sync_overhead = measure_sync_overhead() if on_tpu else 0.0
    run_seed = int(time.time() * 1e3) % 100000
    video = SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=4, sprite_size=48, speed=4.0,
        noise_std=0.002, seed=run_seed,
        distinct_classes=args.model.startswith("pose"),
        # the workload's own distribution: change statistics under its
        # tuned taus must match deployment (eval_headline does the same)
        **workload_video_kwargs(args.model)))
    warm = jnp.asarray(video.clip(T))

    def fresh_clip_sets(n_reps):
        """reps x chunks DISTINCT device-resident chunks. Distinct within
        a trial because the runtime memoizes identical (executable, args)
        dispatches — by the last window the CB state could reach a fixed
        point under a replayed clip and the whole window would be served
        from cache (measured r2 on the dense path: 275->377 'fps')."""
        sets = [[jnp.asarray(video.clip(T)) for _ in range(args.chunks)]
                for _ in range(n_reps)]
        for cs in sets:
            for c in cs:
                _ = float(jnp.sum(c))
        return sets

    clip_sets = fresh_clip_sets(args.reps)
    _ = float(jnp.sum(warm))

    def measure(extra, sets=None):
        """Median steady-state fps over ``reps`` timed windows (each
        window = ``chunks`` dispatches with the production alternating
        refresh-prolog policy). Median-of-N because single short windows
        on this tunnel swing ±20% (bench.py RTT-jitter note) — a greedy
        ratchet on one noisy sample compounds spurious accepts."""
        net = make_net(extra)

        def cb_chunk(p, st, fs, refresh):
            ys, st2, _ = scan_video(net, p, fs, state=st, thresholds=taus,
                                    collect_stats=False, ingest=True,
                                    refresh_start=refresh)
            return jnp.sum(ys[-1]) * 0, st2
        step = jax.jit(cb_chunk, donate_argnums=(1,), static_argnums=(3,))
        # warm-up populates caches + compiles both refresh variants
        _e, st = step(params, None, warm, True)
        _e, st = step(params, st, warm, False)
        _ = float(_e)
        vals = []
        for clips in (sets or clip_sets):
            t0 = time.perf_counter()
            for i, c in enumerate(clips):
                _e, st = step(params, st, c, i % 2 == 0)
            _ = float(_e)
            dt = time.perf_counter() - t0 - sync_overhead
            vals.append(args.chunks * T / max(1e-9, dt))
        vals.sort()
        return vals[len(vals) // 2]

    if args.max_layers is not None:
        convs = convs[:args.max_layers]

    base_fps = best = measure({})
    print(f"{args.model} {H}x{W}: flagship baseline {base_fps:.1f} fps "
          f"({len(convs)} candidate layers)", flush=True)
    accepted = {}
    # stem form trial FIRST (independent knob): the row-band sparse stem
    # (layers.py band_cached) vs the flagship dense_cached stem. The stem
    # is the single largest per-frame cost on scene (65%, PROFILE r3).
    # The two forms are value-identical in f32 and differ by
    # final-rounding ulps in bf16 (test_band_stem.py header) — sub-tau
    # drift; eval_headline re-measures GT accuracy with the policy
    # applied, so the flip is never shipped on the identity claim alone.
    stem_key = (base_net.nodes[0].name if wl.kind == "graph" else 0)
    fps = measure({stem_key: "band_cached"})
    verdict = fps > best * (1 + args.min_gain)
    print(f"  stem -> band_cached: {fps:.1f} fps "
          f"({'ACCEPT' if verdict else 'reject'})", flush=True)
    if verdict:
        accepted, best = {stem_key: "band_cached"}, fps
    # Chip-state sanity guard (VERDICT r4 weak #3): POLICY_seg.json r4
    # recorded a greedy phase at ~718 fps whose fresh-clip re-measure
    # collapsed to 70 fps FOR BOTH ARMS (the in-process sequencing
    # degradation, probe_inprocess.py) and silently reverted the policy
    # on the degraded sample. Decisions made in a collapsed regime are
    # garbage either way — so re-measure the EMPTY baseline every few
    # trials and ABORT LOUDLY (no file written) if it drifts >30% from
    # the phase-start baseline.
    def assert_chip_sane(tag):
        b = measure({})
        if not (0.7 * base_fps <= b <= 1.45 * base_fps):
            raise RuntimeError(
                f"ABORT {tag}: baseline re-measure {b:.1f} fps is >30% "
                f"off the phase-start baseline {base_fps:.1f} — the "
                "in-process degradation regime; rerun in a fresh process "
                "(no policy written)")
        return b

    trials_since_check = 0
    for k in convs:
        # two candidate modes per conv, best-accepted greedily:
        # dense_cached (zero sparse machinery, recompute everything from
        # the accepted cache) and forward_hint (CB17 mask-forwarding:
        # skip detection, recompute the producer's hint region — kills
        # the per-layer detect pass on deep nets at the cost of a
        # monotonically dilating recompute mask; value-exact superset
        # either way, so tuned taus stay valid)
        for mode in ("dense_cached", "forward_hint"):
            trial = dict(accepted)
            trial[k] = mode
            fps = measure(trial)
            verdict = fps > best * (1 + args.min_gain)
            print(f"  layer {k} -> {mode}: {fps:.1f} fps "
                  f"({'ACCEPT' if verdict else 'reject'})", flush=True)
            if verdict:
                accepted, best = trial, fps
            trials_since_check += 1
            if trials_since_check >= 6:
                trials_since_check = 0
                assert_chip_sane(f"mid-greedy (after layer {k})")

    # re-measure the final pick on FRESH clips: the greedy ratchet's
    # `best` rode whatever upward noise survived the medians, so the
    # reported gain must come from an independent sample — and a final
    # pick that does not reproduce is dropped rather than shipped.
    final_fps, base2 = best, base_fps
    if accepted:
        sets2 = fresh_clip_sets(args.reps)
        base2 = measure({}, sets2)
        # the r4 guard, made loud: a fresh-clip baseline >2x off the
        # greedy-phase baseline is the collapse regime — abort instead
        # of deciding on it (VERDICT r5 brief #5)
        if not (0.5 * base_fps <= base2 <= 2.0 * base_fps):
            raise RuntimeError(
                f"ABORT final re-measure: fresh-clip baseline "
                f"{base2:.1f} fps is >2x off the greedy-phase baseline "
                f"{base_fps:.1f} — in-process degradation; rerun in a "
                "fresh process (no policy written)")
        final_fps = measure(accepted, sets2)
        if final_fps <= base2:
            print(f"  re-measure: {final_fps:.1f} <= baseline {base2:.1f} "
                  "fps — policy does not reproduce, writing empty policy",
                  flush=True)
            accepted, final_fps = {}, base2

    out = {"model": args.model, "shape": [H, W], "frames_per_chunk": T,
           "chunks": args.chunks, "reps": args.reps,
           "backend": cfg.backend,
           "capacity_fraction": cfg.tile.capacity_fraction,
           "tau_source": wl.tau_source, "seed": run_seed,
           "baseline_fps": round(base2, 1), "final_fps": round(final_fps, 1),
           "greedy_fps": {"baseline": round(base_fps, 1),
                          "best": round(best, 1)},
           "gain": round(final_fps / max(1e-9, base2), 3),
           "overrides": {str(k): v for k, v in accepted.items()}}
    print(json.dumps(out), flush=True)
    if not on_tpu and not os.environ.get("CBINFER_POLICY_ALLOW_CPU"):
        # CPU timings are meaningless for the deployed (TPU) policy and
        # bench/zoo consume POLICY files unconditionally — don't clobber
        print("NOT writing policy: no TPU device (set "
              "CBINFER_POLICY_ALLOW_CPU=1 to force)", flush=True)
        return
    path = f"/root/repo/POLICY_{args.model}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
