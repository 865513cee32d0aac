"""Headline benchmark: CB vs dense frames/sec/chip on 720p video.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...} as
required by the driver. Metric definition per BASELINE.json: frames/sec/chip
on 720p video; vs_baseline = CB fps / dense fps on identical inputs (>=2x
target). The same run also measures the other two BASELINE pillars and
reports them as extra keys: "miou_degradation" = miou_gt(dense) -
miou_gt(cb) on ground-truth labels (<=0.5% target; the BASELINE "mIoU
delta vs full-frame" — agreement mIoU is fp-noise-bound at ~0.99 and also
reported as "miou_vs_dense") and "flop_reduction" (>=3x target), plus
provenance ("weights", "tau_source") so a random-weights or default-tau
run is visible, never silent.

Timing notes (hard-won; see scripts/tpu_session.py):
  * frame loops live INSIDE one jitted dispatch (lax.map / lax.scan) —
    python-loop dispatch timing measures tunnel latency or gets memoized;
  * every timed dispatch sees fresh frames in ONE untimed->timed pass (the
    CB state is a fixed point under a repeated clip, and the runtime
    memoizes identical dispatches — distinct chunks make reuse impossible);
  * NO host-side ops on big arrays inside the timed loop: an innocent
    `chunk + eps` costs ~10 ms/frame of axon-tunnel serialization (measured
    r2) and was inflating the r1 DENSE baseline ~2x. Data-dependence
    chaining is therefore NOT used for dense; honesty comes from distinct
    device-resident chunks instead. The CB path chains through its state
    for free.
  * clips are forced device-resident (scalar-fetch) before timing;
  * block_until_ready is unreliable here — sync via scalar fetch.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# importing the package applies the adopted MSA flag to LIBTPU_INIT_ARGS
# before libtpu initializes (cbinfer_tpu/tpu_env.py)
import cbinfer_tpu  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REPO = os.path.dirname(os.path.abspath(__file__))
NPZ = os.path.join(REPO, "ckpts", "scene_w128.npz")
ORBAX = os.path.join(REPO, "ckpts", "scene_w128")
TAU_JSON = os.path.join(REPO, "ckpts", "scene_w128_tau.json")


def _load_params(specs, in_shape):
    """Trained weights (scripts/train_scene.py), loudly falling back.

    Returns (params, provenance). Random weights change both change rates
    and the accuracy story (RESULTS.md), so provenance is part of the
    benchmark output.
    """
    from cbinfer_tpu.network import init_params

    params = init_params(specs, in_shape, jax.random.PRNGKey(0))
    try:
        from cbinfer_tpu.checkpoint import load_npz_params
        return load_npz_params(NPZ, params), "trained(npz)"
    except Exception as e:
        print(f"bench: npz weights unavailable ({e}); trying orbax",
              file=sys.stderr)
    try:
        from cbinfer_tpu import checkpoint
        like = {"params": jax.tree.map(np.asarray, params),
                "extra": {"acc": 0.0, "classes": 0, "width": 0}}
        ck = checkpoint.restore(ORBAX, like=like, as_numpy=True)
        params = jax.tree.map(jnp.asarray, ck["params"])
        return params, "trained(orbax)"
    except Exception as e:
        print(f"bench: WARNING — no trained weights loaded ({e}); "
              "benchmarking RANDOM weights. Accuracy/change-rate numbers "
              "will not reflect the trained operating point.",
              file=sys.stderr)
        return params, "random"


def _load_thresholds(n_cb):
    """Tuner-chosen tau vector + refresh interval (scripts/tune_model.py),
    else defaults. Returns (taus, refresh_every, provenance)."""
    try:
        with open(TAU_JSON) as f:
            d = json.load(f)
        taus = d["thresholds"]
        assert len(taus) == n_cb, (len(taus), n_cb)
        return taus, d.get("metadata", {}).get("refresh_every"), "tuned"
    except Exception as e:
        print(f"bench: no tuned thresholds ({e}); using default tau=0.04",
              file=sys.stderr)
        return [0.04] * n_cb, 32, "default"


def _devices_or_die(timeout_s: int = 180):
    """Bounded device init (shared helper; see its docstring).

    On the axon-tunneled platform, first ride out a transient terminal
    wedge (stale session claim: first op blocks while enumeration works,
    observed r3) with a bounded subprocess retry gate — the driver's
    end-of-round bench should survive a wedge that clears, and fall
    through to devices_or_die's clear FATAL when it doesn't."""
    from cbinfer_tpu.benchmark import devices_or_die, wait_for_tpu
    if "axon" in os.environ.get("JAX_PLATFORMS", ""):
        wait_for_tpu(deadline_s=600.0)
    return devices_or_die(timeout_s)


def main():
    from cbinfer_tpu.config import PipelineConfig, TileConfig
    from cbinfer_tpu.convert import convert_flagship, num_cb_layers
    from cbinfer_tpu.metrics import effective_flops
    from cbinfer_tpu.models import get_model
    from cbinfer_tpu.runner import scan_video
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig

    H, W = 720, 1280
    T = 32          # frames per timed dispatch
    CHUNKS = 8      # timed dispatches (distinct frames each): the window
    # must be large vs the tunnel RTT jitter (~±15 ms on a ~30 ms RTT,
    # measured r3) or per-frame numbers swing ±20%. At the argmax_u8
    # operating point the CB pass runs ~900 fps, so 8x32 frames keep the
    # timed window ~0.3 s (>=20x the jitter); device footprint is ~2.8 GB
    # of staged clips against 16 GB HBM.
    NUM_CLASSES = 8
    on_tpu = any(d.platform == "tpu" for d in _devices_or_die())
    backend = "pallas" if on_tpu else "jnp"

    # Per-sync overhead of this host<->device link (dispatch + scalar-fetch
    # round trip; median of 5 null-op samples — shared methodology helper),
    # subtracted from elapsed times: the metric is device throughput, not
    # tunnel latency.
    from cbinfer_tpu.benchmark import measure_sync_overhead
    sync_overhead = measure_sync_overhead()

    # scene-labeling CNN at MXU-friendly width (BASELINE configs[1] family)
    specs = get_model("scene", num_classes=NUM_CLASSES, width=128)
    cfg = PipelineConfig(
        tile=TileConfig(tile_h=8, tile_w=8, capacity_fraction=0.375),
        backend=backend,
        compute_dtype="bfloat16" if on_tpu else "float32",
        cache_dtype="bfloat16" if on_tpu else "float32")
    # Flagship config — THE SAME construction scripts/tune_model.py
    # calibrated the shipped thresholds against (dense_cached cin=3 stem +
    # dense 1x1 classifier; see convert.flagship_layers for the rationale).
    # A measured per-layer backend policy (scripts/optimize_policy.py)
    # layers on top when present — accuracy-neutral by construction
    # (dense_cached keeps the accepted-cache tau semantics), so the tuned
    # tau file stays valid.
    extra, policy_src, fuse = None, "none", False
    ppath = os.path.join(REPO, "POLICY_scene.json")
    if os.path.exists(ppath):
        with open(ppath) as f:
            _pj = json.load(f)
        _pol = _pj.get("overrides") or {}
        # fused consumer-detect: bit-identical kernel pair, adopted per
        # workload from the interleaved A/B (EXP_fused_ab.json via
        # scripts/harvest_fused_ab.py)
        fuse = bool(_pj.get("fuse_detect", False))
        if _pol:
            extra = {int(k): v for k, v in _pol.items()}
        if _pol or fuse:
            policy_src = ppath
    net = convert_flagship(specs, (H, W, 3), cfg, extra_overrides=extra,
                           fuse_detect=fuse)
    params, weights_src = _load_params(specs, (H, W, 3))
    taus, refresh, tau_src = _load_thresholds(num_cb_layers(net.specs))
    tau_vec = jnp.asarray(taus, jnp.float32)

    # Per-run unique seed: the runtime memoizes identical dispatches
    # ACROSS processes, so a fixed clip makes repeat runs read from cache
    # and report inflated fps (measured r2: dense drifted 275->377 fps
    # over identical reruns). Same sprite statistics, fresh pixels.
    run_seed = int(time.time() * 1e3) % 100000
    video = SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=4, sprite_size=48, speed=4.0,
        noise_std=0.002, seed=run_seed))
    warm_chunk = jnp.asarray(video.clip(T))  # warm-up only, never timed:
    # a timed dispatch with args identical to the warm one gets memoized
    chunks = [jnp.asarray(video.clip(T)) for _ in range(CHUNKS)]
    for ch in chunks + [warm_chunk]:
        _ = float(jnp.sum(ch))  # force device-resident

    # --- output form: BOTH paths emit per-frame uint8 argmax class maps ---
    # The deployment output of a labeling CNN is the class map, and the
    # pillar ratio must compare identical output forms. Stacking 8-channel
    # bf16 logits over T is lane-padded 16x by TPU layouts; stacking the
    # argmax u8 map cuts that write ~30x on the CB side (whose frame is
    # ~1.2 ms) while the dense side barely moves (3.42 -> 3.40 ms/frame,
    # EXP_variants out/out_dense, measured on-chip r3) — argmax-vs-argmax
    # and logits-vs-logits are both fair; the u8 form is the faster
    # production operating point, so the headline ships it.
    out_u8 = lambda y: jnp.argmax(y, -1).astype(jnp.uint8)

    # --- dense baseline ---
    def dense_body(p, fs):
        ys = jax.lax.map(lambda x: out_u8(net.apply_dense(p, x)), fs)
        return ys, jnp.sum(ys[-1]) * 0
    dense_scan = jax.jit(dense_body)
    d, _eps = dense_scan(params, warm_chunk)
    _ = float(jnp.sum(d[-1]))  # compile + warm
    t0 = time.perf_counter()
    for ch in chunks:  # distinct chunks, single pass: nothing to memoize
        d, _eps = dense_scan(params, ch)
    _ = float(jnp.sum(d[-1]))
    dense_fps = CHUNKS * T / max(1e-9,
                                 time.perf_counter() - t0 - sync_overhead)

    # --- CB path (timed WITH the production refresh policy) ---
    # Chunked deployment refreshes at every OTHER chunk start (interval =
    # 2T = 64 frames) via the cond-free refresh_start prolog — see
    # runner.scan_video. The tuned taus were calibrated under
    # refresh_every=32 and re-validated at interval 64 and 128 with zero
    # measured ground-truth degradation over a 128-frame horizon on both
    # calibration seeds (r3).
    # measured drift validation (scripts/validate_refresh.py via the
    # parity-guarded zoo loader), clamped to the timed window so it
    # always spans >=1 full period (else the amortized refresh cost is
    # understated)
    from cbinfer_tpu.zoo import load_refresh_cadence
    REFRESH_EVERY_CHUNKS, refresh_src = load_refresh_cadence(
        "scene", T, H, W)
    REFRESH_EVERY_CHUNKS = min(REFRESH_EVERY_CHUNKS, CHUNKS)
    # TIMED form (EXP_stats_ab, same-process interleaved A/B, r4): the
    # deployment scan drops the stat accumulators AND the clip-resident
    # ingest staging — measured 1.17x the r3 mean+ingest form on scene
    # (0.467 vs 0.547 ms/frame; stats alone ~3%, ingest ~14% — the r3
    # ingest adoption does not hold at the current operating point).
    # Stats are observability, not deployment output; the FLOP pillar is
    # measured by the separate UNTIMED accuracy pass below with its own
    # stats-enabled executables.
    def mk_cb(refresh_start, stats_form):
        return jax.jit(
            lambda p, fs, st: scan_video(net, p, fs, state=st,
                                         thresholds=tau_vec,
                                         refresh_start=refresh_start,
                                         out_map=out_u8,
                                         collect_stats=stats_form,
                                         ingest=False),
            donate_argnums=(2,))

    cb_refresh, cb_plain = mk_cb(True, False), mk_cb(False, False)

    def cb_scan(p, fs, st, i):
        f = cb_refresh if i % REFRESH_EVERY_CHUNKS == 0 else cb_plain
        y, st2 = f(p, fs, st)[:2]
        return y, st2

    ys, state = cb_refresh(params, warm_chunk, net.init_state())[:2]
    _ = float(jnp.sum(ys[-1]))  # compile + cold start + cache warm
    ys, state = cb_plain(params, warm_chunk, state)[:2]
    _ = float(jnp.sum(ys[-1]))  # compile the plain variant too (untimed)
    t0 = time.perf_counter()
    for i, ch in enumerate(chunks):
        ys, state = cb_scan(params, ch, state, i)
    _ = float(jnp.sum(ys[-1]))
    cb_fps = CHUNKS * T / max(1e-9,
                              time.perf_counter() - t0 - sync_overhead)

    # --- accuracy + FLOP pillars, on the FIXED benchmark video ---
    # Accuracy must be reproducible run-to-run, so it is measured on the
    # canonical seed-0 clip (fresh state, steady-state horizon incl. the
    # refresh policy), separately from the unique-seed timing clips.
    # CHUNKED: each dispatch holds ONE 720p scan — jitting the CB scan and
    # a dense-reference scan into a single program OOM'd the 16 GB chip
    # (BENCH_r02 rc=1). The already-compiled timing executables are reused
    # chunk-by-chunk (CB state threads across chunks) and per-class
    # intersection/union counts accumulate on the host (tiny fetches), so
    # peak HBM never exceeds the timing loop's own footprint.
    # The accuracy pillar is GROUND-TRUTH degradation, miou_gt(dense) -
    # miou_gt(cb) (BASELINE "mIoU delta vs full-frame"): agreement mIoU
    # (cb argmax vs dense argmax) sits at an fp-noise floor of ~0.99 on
    # this hardware — both paths flip near-boundary pixels of rare
    # classes under bf16 rounding — so it cannot resolve a 0.5% budget
    # (see metrics.miou_labels). Agreement is still reported.
    from cbinfer_tpu.metrics import iu_maps_device, merge_iu
    from cbinfer_tpu.network import out_shapes
    acc_video = SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=4, sprite_size=48, speed=4.0,
        noise_std=0.002, seed=0))
    stride = H // out_shapes(net.specs, (H, W, 3))[-1][0]
    # both timed executables emit argmax u8 maps, so the accuracy pass
    # compares maps directly (iu_maps_device) — same executables, no
    # extra 720p compiles
    iu_agree = jax.jit(lambda a, b: iu_maps_device(a, b, NUM_CLASSES))
    iu_gt = jax.jit(lambda a, l: iu_maps_device(a, l, NUM_CLASSES))
    acc_state = net.init_state()
    sums = {k: (np.zeros((NUM_CLASSES,), np.int64),
                np.zeros((NUM_CLASSES,), np.int64))
            for k in ("agree", "cb_gt", "dense_gt")}

    def accum(key, a, b):
        i0, u0 = sums[key]
        sums[key] = (i0 + np.asarray(a, np.int64),
                     u0 + np.asarray(b, np.int64))

    acc_stats = []
    # stats-enabled twins for this UNTIMED pass only (the timed loop is
    # stats-free since r4, EXP_stats_ab): the FLOP pillar's per-layer
    # counters come from here — identical math, extra executables are
    # persistent-cached
    cb_refresh_s, cb_plain_s = mk_cb(True, "mean"), mk_cb(False, "mean")
    # span at least one FULL refresh period: drift peaks in the last
    # chunk before a refresh, so accuracy measured over fewer chunks
    # than the cadence would score a fresher regime than the shipped
    # policy (review r3)
    for i in range(max(2, REFRESH_EVERY_CHUNKS)):
        ch, lab = acc_video.clip_with_labels(T)
        ch = jnp.asarray(ch)
        lab = jnp.asarray(lab[:, ::stride, ::stride])
        dn, _eps = dense_scan(params, ch)
        f = cb_refresh_s if i % REFRESH_EVERY_CHUNKS == 0 else cb_plain_s
        ys, acc_state, stats = f(params, ch, acc_state)
        skip = 8 if i == 0 else 0  # cold start is exact by construction
        accum("agree", *iu_agree(ys[skip:], dn[skip:]))
        accum("cb_gt", *iu_gt(ys[skip:], lab[skip:]))
        accum("dense_gt", *iu_gt(dn[skip:], lab[skip:]))
        acc_stats.append(jax.device_get(stats))
    m_agree = merge_iu(*sums["agree"])
    m_cb_gt = merge_iu(*sums["cb_gt"])
    m_dense_gt = merge_iu(*sums["dense_gt"])
    from cbinfer_tpu.benchmark import concat_stats
    stats = concat_stats(acc_stats)
    ef = effective_flops(stats, net.specs, (H, W, 3),
                         cfg.tile.tile_h, cfg.tile.tile_w)

    print(json.dumps({
        "metric": "frames/sec/chip, 720p scene-labeling CNN (CB path)",
        "value": round(cb_fps, 3),
        "unit": "fps",
        "vs_baseline": round(cb_fps / dense_fps, 3),
        "dense_fps": round(dense_fps, 3),
        # the <=0.5%-degradation pillar: task-metric delta vs full-frame
        "miou_degradation": round(m_dense_gt - m_cb_gt, 5),
        "miou_gt_dense": round(m_dense_gt, 5),
        "miou_gt_cb": round(m_cb_gt, 5),
        "miou_vs_dense": round(m_agree, 5),
        "flop_reduction": round(ef["flop_reduction"], 2),
        "output_form": "argmax_u8 class maps (both paths; see EXP_variants"
                       " out/out_dense for the logits-form twin)",
        "timed_form": "stats-free classic scan (EXP_stats_ab r4: 1.17x "
                      "the mean+ingest form; FLOP counters from the "
                      "untimed accuracy pass)",
        "weights": weights_src,
        "tau_source": tau_src,
        "backend_policy": policy_src,
        "refresh": f"chunk-start prolog every {REFRESH_EVERY_CHUNKS} "
                   f"chunks, interval {REFRESH_EVERY_CHUNKS * T} "
                   f"({refresh_src}; tuned under refresh_every={refresh})",
        "timing_video_seed": run_seed,
        "accuracy_video_seed": 0,
    }))


if __name__ == "__main__":
    sys.exit(main())
