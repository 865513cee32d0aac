"""Streaming/state tests (SURVEY.md §4 test 4) + metrics sanity."""

import numpy as np
import jax
import jax.numpy as jnp

from cbinfer_tpu.config import ConvSpec, PipelineConfig, PoolSpec, TileConfig
from cbinfer_tpu.convert import convert
from cbinfer_tpu.metrics import (change_rate_histogram, effective_flops,
                                 miou, pck)
from cbinfer_tpu.network import init_params
from cbinfer_tpu.runner import FrameStepper, scan_video, scan_video_jit
from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig


def _net(h=32, w=48, tau=0.02):
    specs = [
        ConvSpec(features=8, threshold=tau),
        PoolSpec(threshold=tau),
        ConvSpec(features=8, threshold=tau),
        ConvSpec(features=5, kernel=(1, 1), activation=None, threshold=tau),
    ]
    cfg = PipelineConfig(tile=TileConfig(tile_h=4, tile_w=4))
    net = convert(specs, (h, w, 3), cfg)
    params = init_params(specs, (h, w, 3), jax.random.PRNGKey(1))
    return net, params, specs


def test_scan_equals_python_loop():
    net, params, _ = _net()
    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=32, width=48, seed=0)).clip(6))
    ys_scan, final_state, stats = scan_video(net, params, clip)
    # python loop of jitted steps
    state = net.init_state()
    step = jax.jit(net.apply)
    for t in range(6):
        y, state, _ = step(params, state, clip[t])
        np.testing.assert_allclose(np.asarray(ys_scan[t]), np.asarray(y),
                                   atol=1e-6)
    # final caches identical
    for a, b in zip(jax.tree.leaves(final_state), jax.tree.leaves(state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_scan_jit_with_donation_runs_twice():
    """State donation must not corrupt subsequent runs (fresh state each)."""
    net, params, _ = _net()
    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=32, width=48, seed=1)).clip(4))
    run = scan_video_jit(net)
    y1, _, _ = run(params, clip, net.init_state())
    y2, _, _ = run(params, clip, net.init_state())
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_frame_stepper_matches_scan():
    net, params, _ = _net()
    clip = SpriteVideo(SpriteVideoConfig(height=32, width=48, seed=2)).clip(5)
    ys_scan, _, _ = scan_video(net, params, jnp.asarray(clip))
    stepper = FrameStepper(net, params)
    for t in range(5):
        y, _ = stepper(clip[t])
        np.testing.assert_allclose(np.asarray(y), np.asarray(ys_scan[t]),
                                   atol=1e-6)
    stepper.reset()
    y0, _ = stepper(clip[0])
    np.testing.assert_allclose(np.asarray(y0), np.asarray(ys_scan[0]),
                               atol=1e-6)


def test_effective_flops_and_change_rates():
    net, params, specs = _net(tau=0.03)
    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=32, width=48, n_sprites=1, sprite_size=6, seed=3)).clip(8))
    _, _, stats = scan_video(net, params, clip)
    ef = effective_flops(stats, net.specs, (32, 48, 3), 4, 4)
    assert ef["dense_flops_per_frame"] > 0
    # frame 0 is dense, later frames sparse -> reduction must exceed 1
    assert ef["flop_reduction"] > 1.0
    hist = change_rate_histogram(stats)
    assert hist[0]["max_fraction"] == 1.0  # cold start frame
    assert 0 < hist[0]["mean_fraction"] < 1.0


def test_miou_pck_self_identity():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((16, 16, 5)).astype(np.float32)
    assert miou(logits, logits, 5) == 1.0
    hm = rng.standard_normal((32, 32, 7)).astype(np.float32)
    assert pck(hm, hm) == 1.0
    # a perturbation that moves argmaxes must reduce both
    logits2 = logits + rng.standard_normal(logits.shape).astype(np.float32)
    assert miou(logits, logits2, 5) < 1.0


def test_refresh_every_bounds_drift():
    """refresh_every=K: refresh frames match the dense forward exactly and
    the refresh phase follows frame_offset across chunked scans."""
    net, params, _ = _net(tau=0.3)  # huge tau: heavy drift between refreshes
    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=32, width=48, n_sprites=2, noise_std=0.01, seed=9)).clip(8))
    ys, state, _ = scan_video(net, params, clip, refresh_every=4)
    dense = jnp.stack([net.apply_dense(params, f) for f in clip])
    # frames 0 and 4 are refreshes: exact (fp tolerance) dense agreement
    for t in (0, 4):
        np.testing.assert_allclose(np.asarray(ys[t]), np.asarray(dense[t]),
                                   atol=2e-5)
    # drifted frames differ at tau=0.3 (the refresh is doing real work)
    assert np.abs(np.asarray(ys[3]) - np.asarray(dense[3])).max() > 1e-3

    # chunked continuation: offset keeps the phase — frame 8 (global) is a
    # refresh for the second chunk
    clip2 = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=32, width=48, n_sprites=2, noise_std=0.01, seed=10)).clip(4))
    ys2, _, _ = scan_video(net, params, clip2, state=state,
                           refresh_every=4, frame_offset=8)
    d2 = net.apply_dense(params, clip2[0])
    np.testing.assert_allclose(np.asarray(ys2[0]), np.asarray(d2),
                               atol=2e-5)


def test_refresh_start_matches_refresh_every():
    """refresh_start chunks (cond-free prolog) == refresh_every=K with
    chunk-aligned offsets, bit-for-bit; stats keep (T,) leaves."""
    net, params, _ = _net(tau=0.3)
    T = 4
    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=32, width=48, n_sprites=2, noise_std=0.01, seed=9)).clip(2 * T))
    state = None
    outs = []
    for i in range(2):
        ys, state, stats = scan_video(net, params, clip[i * T:(i + 1) * T],
                                      state=state, refresh_start=True)
        outs.append(np.asarray(ys))
    ys_cond, _, _ = scan_video(net, params, clip, refresh_every=T)
    np.testing.assert_array_equal(np.concatenate(outs), np.asarray(ys_cond))
    s0 = [s for s in stats if s][0]
    assert np.asarray(s0["computed_tiles"]).shape == (T,)


def test_gt_metrics_match_host_and_chunked():
    """miou_labels == device twin == chunk-accumulated iu/merge_iu; and the
    degradation composite is 0 when CB == dense."""
    from cbinfer_tpu.metrics import (merge_iu, miou_labels,
                                     miou_labels_device,
                                     miou_labels_iu_device, miou_iu_device,
                                     miou)
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((6, 16, 24, 5)).astype(np.float32)
    labels = rng.integers(0, 5, (6, 16, 24)).astype(np.int32)
    host = miou_labels(logits, labels, 5)
    dev = float(miou_labels_device(jnp.asarray(logits),
                                   jnp.asarray(labels), 5))
    assert abs(host - dev) < 1e-6
    # chunked accumulation reproduces the single-shot value
    i1, u1 = miou_labels_iu_device(jnp.asarray(logits[:3]),
                                   jnp.asarray(labels[:3]), 5)
    i2, u2 = miou_labels_iu_device(jnp.asarray(logits[3:]),
                                   jnp.asarray(labels[3:]), 5)
    merged = merge_iu(np.asarray(i1) + np.asarray(i2),
                      np.asarray(u1) + np.asarray(u2))
    assert abs(merged - host) < 1e-9
    # agreement iu twin matches `miou`
    a, b = miou_iu_device(jnp.asarray(logits), jnp.asarray(logits), 5)
    assert merge_iu(np.asarray(a), np.asarray(b)) == 1.0
    assert miou(logits, logits, 5) == 1.0
    # map-form twin (bench.py's argmax_u8 output form) == logits twin
    from cbinfer_tpu.metrics import iu_maps_device
    other = rng.standard_normal(logits.shape).astype(np.float32)
    i3, u3 = miou_iu_device(jnp.asarray(logits), jnp.asarray(other), 5)
    i4, u4 = iu_maps_device(
        jnp.argmax(jnp.asarray(logits), -1).astype(jnp.uint8),
        jnp.argmax(jnp.asarray(other), -1).astype(jnp.uint8), 5)
    assert np.array_equal(np.asarray(i3), np.asarray(i4))
    assert np.array_equal(np.asarray(u3), np.asarray(u4))
    # and against integer ground-truth labels directly
    i5, u5 = miou_labels_iu_device(jnp.asarray(logits),
                                   jnp.asarray(labels), 5)
    i6, u6 = iu_maps_device(
        jnp.argmax(jnp.asarray(logits), -1).astype(jnp.uint8),
        jnp.asarray(labels), 5)
    assert np.array_equal(np.asarray(i5), np.asarray(i6))
    assert np.array_equal(np.asarray(u5), np.asarray(u6))


def test_tau_minus_one_is_mask_forwarding():
    """CB17-style mask forwarding == per-layer tau=-1: the layer accepts
    and recomputes EXACTLY the producer's dilated (hinted) region — its
    changed-tile mask equals the hint superset, never less — while the
    re-detection default (finite tau) recomputes a subset. Outputs agree
    with dense either way (forwarding is a conservative superset)."""
    from cbinfer_tpu.convert import convert_flagship
    from cbinfer_tpu.models import get_model

    H, W, T = 32, 48, 6
    specs = get_model("scene_tiny", num_classes=5, width=8)
    cfg = PipelineConfig(tile=TileConfig(4, 4, capacity_fraction=1.0))
    net = convert_flagship(specs, (H, W, 3), cfg)
    n_cb = sum(1 for s in net.specs if getattr(s, "use_cb", False))
    params = init_params(specs, (H, W, 3), jax.random.PRNGKey(0))
    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=1, sprite_size=8, noise_std=0.0,
        seed=6)).clip(T))

    def run(layer1_tau):
        taus = np.full((n_cb,), 0.02, np.float32)
        taus[1] = layer1_tau  # the pool after the dense_cached stem
        return scan_video(net, params, clip,
                          thresholds=jnp.asarray(taus))

    ys_f, _, st_f = run(-1.0)    # forwarding
    ys_r, _, st_r = run(0.02)    # re-detection
    cb_stats_f = [s for s in st_f if s]
    cb_stats_r = [s for s in st_r if s]
    # forwarding recomputes at least as much at that layer...
    comp_f = np.asarray(cb_stats_f[1]["computed_tiles"])
    comp_r = np.asarray(cb_stats_r[1]["computed_tiles"])
    assert np.all(comp_f >= comp_r)
    # ...equal to its detect visit count (every hinted tile recomputed)
    det_f = np.asarray(cb_stats_f[1]["changed_tiles"])
    assert np.all(comp_f == det_f)
    # both modes agree with dense at the task level (raw logits differ by
    # conv-algorithm fp rounding between the tile and dense paths)
    dense = jnp.stack([net.apply_dense(params, f) for f in clip])
    assert miou(np.asarray(ys_f), np.asarray(dense), 5) == 1.0
    assert miou(np.asarray(ys_r), np.asarray(dense), 5) == 1.0


def test_conv_forward_hint_equals_tau_minus_one():
    """ConvSpec.forward_hint (CB17 mask-forwarding fast path) is
    bit-identical to running the same layer at tau = -1 through
    re-detection, on both backends (ConvSpec.forward_hint doc)."""
    import dataclasses
    from cbinfer_tpu.convert import convert
    from cbinfer_tpu.network import init_params

    specs = [
        ConvSpec(features=16, threshold=0.03),
        ConvSpec(features=16, threshold=0.03),    # <- forwarded / tau=-1
        ConvSpec(features=5, kernel=(1, 1), activation=None,
                 threshold=0.03),
    ]
    fwd_specs = [specs[0],
                 dataclasses.replace(specs[1], forward_hint=True),
                 specs[2]]
    params = init_params(specs, (32, 48, 3), jax.random.PRNGKey(17))
    video = SpriteVideo(SpriteVideoConfig(height=32, width=48, n_sprites=2,
                                          sprite_size=7, speed=3.0,
                                          noise_std=0.01, seed=41))
    clip = jnp.asarray(video.clip(5))
    for backend, interp in (("jnp", False), ("pallas", True)):
        cfg = PipelineConfig(tile=TileConfig(tile_h=8, tile_w=8),
                             backend=backend, interpret=interp)
        net_fwd = convert(fwd_specs, (32, 48, 3), cfg)
        net_ref = convert(specs, (32, 48, 3), cfg)
        taus_ref = jnp.asarray([0.03, -1.0, 0.03], jnp.float32)
        ys_f, _, st_f = scan_video(net_fwd, params, clip)
        ys_r, _, st_r = scan_video(net_ref, params, clip,
                                   thresholds=taus_ref)
        np.testing.assert_array_equal(np.asarray(ys_f), np.asarray(ys_r),
                                      err_msg=backend)
        # identical recompute sets on the forwarded layer
        np.testing.assert_array_equal(
            np.asarray(st_f[1]["computed_tiles"]),
            np.asarray(st_r[1]["computed_tiles"]), backend)
        # and zero detection traffic... is NOT claimed on jnp (full-map
        # where); on pallas the accept kernel visits exactly the hint
        if backend == "pallas":
            assert (np.asarray(st_f[1]["detect_tiles"])
                    <= np.asarray(st_r[1]["detect_tiles"])).all()


def test_drift_bound_dominates_measured_drift():
    """metrics.drift_bound is an upper bound on streamed CB-vs-dense
    drift (the papers' bounded-error property of the accepted-cache
    rule), zero at tau=0, and monotone in tau."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cbinfer_tpu.config import ConvSpec, PipelineConfig, PoolSpec, \
        TileConfig
    from cbinfer_tpu.convert import convert
    from cbinfer_tpu.metrics import drift_bound
    from cbinfer_tpu.network import dense_apply, init_params
    from cbinfer_tpu.runner import scan_video
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig

    specs = [ConvSpec(features=8), PoolSpec(),
             ConvSpec(features=8), ConvSpec(features=4, kernel=(1, 1),
                                            activation=None)]
    in_shape = (24, 32, 3)
    params = init_params(specs, in_shape, jax.random.PRNGKey(0))
    assert drift_bound(specs, params, [0.0] * 4) == 0.0
    b_small = drift_bound(specs, params, [0.01] * 4)
    b_big = drift_bound(specs, params, [0.05] * 4)
    assert 0 < b_small < b_big

    cfg = PipelineConfig(tile=TileConfig(4, 4), backend="jnp")
    net = convert(specs, in_shape, cfg)
    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=24, width=32, seed=3, n_sprites=1, sprite_size=6,
        noise_std=0.004)).clip(12))
    ys, _, _ = scan_video(net, params, clip,
                          thresholds=jnp.asarray([0.05] * 4, jnp.float32))
    dense = jnp.stack([dense_apply(specs, params, f) for f in clip])
    measured = float(jnp.max(jnp.abs(ys - dense)))
    assert measured <= b_big, (measured, b_big)


def test_scan_video_out_map_argmax_u8():
    """out_map transforms each stacked frame (incl. the refresh prolog's)
    — uint8 class maps must equal argmax of the logits run."""
    import numpy as np
    from cbinfer_tpu.config import PipelineConfig, TileConfig
    from cbinfer_tpu.convert import convert, num_cb_layers
    from cbinfer_tpu.models import get_model
    from cbinfer_tpu.network import init_params
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig

    specs = get_model("scene", num_classes=8, width=32)
    H, W = 96, 128
    cfg = PipelineConfig(tile=TileConfig(8, 8, capacity_fraction=0.5),
                         backend="jnp", compute_dtype="float32",
                         cache_dtype="float32")
    net = convert(specs, (H, W, 3), cfg,
                  thresholds=[0.02] * num_cb_layers(specs))
    p = init_params(specs, (H, W, 3), jax.random.PRNGKey(1))
    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=3, sprite_size=16, seed=3)).clip(5))

    def am(y):
        return jnp.argmax(y, -1).astype(jnp.uint8)

    y1, _, _ = jax.jit(lambda f: scan_video(net, p, f,
                                            refresh_start=True))(clip)
    y2, _, _ = jax.jit(lambda f: scan_video(net, p, f, refresh_start=True,
                                            out_map=am))(clip)
    assert y2.dtype == jnp.uint8 and y2.shape == y1.shape[:-1]
    np.testing.assert_array_equal(
        np.argmax(np.asarray(y1), -1).astype(np.uint8), np.asarray(y2))


def test_frame_stepper_deployment_knobs():
    """FrameStepper's live-source twin of the deployment loop: runtime
    thresholds + periodic refresh + out_map must together match
    scan_video(refresh_every=K) with the same knobs."""
    net, params, _ = _net()
    clip = SpriteVideo(SpriteVideoConfig(height=32, width=48, seed=4)).clip(7)
    taus = [0.03, 0.03, 0.02, 0.02]
    out_map = lambda y: jnp.argmax(y, axis=-1).astype(jnp.uint8)
    ys_scan, _, _ = scan_video(net, params, jnp.asarray(clip),
                               thresholds=jnp.asarray(taus, jnp.float32),
                               refresh_every=3, out_map=out_map)
    stepper = FrameStepper(net, params, thresholds=taus, refresh_every=3,
                           out_map=out_map)
    for t in range(7):
        y, _ = stepper(clip[t])
        assert y.dtype == jnp.uint8
        np.testing.assert_array_equal(np.asarray(y), np.asarray(ys_scan[t]))
    # reset restarts the refresh phase (frame 0 = cold start again)
    stepper.reset()
    y0, _ = stepper(clip[0])
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(ys_scan[0]))


def test_frame_stepper_micro_batch_matches_per_frame():
    """step_chunk (K frames per dispatch — the live latency/throughput
    dial, VERDICT r3 next #2) must produce the per-frame path's exact
    outputs and honor the refresh cadence at chunk granularity: with
    refresh_every a multiple of K, chunk boundaries align and the two
    paths refresh on the same frames."""
    net, params, _ = _net()
    clip = SpriteVideo(SpriteVideoConfig(height=32, width=48,
                                         seed=6)).clip(12)
    taus = [0.03, 0.03, 0.02, 0.02]
    out_map = lambda y: jnp.argmax(y, axis=-1).astype(jnp.uint8)
    ref = FrameStepper(net, params, thresholds=taus, refresh_every=4,
                       out_map=out_map)
    ys_ref = [np.asarray(ref(clip[t])[0]) for t in range(12)]
    mb = FrameStepper(net, params, thresholds=taus, refresh_every=4,
                      out_map=out_map)
    for c in range(3):
        ys, stats = mb.step_chunk(clip[4 * c:4 * (c + 1)])
        assert ys.shape[0] == 4 and ys.dtype == jnp.uint8
        assert jax.tree.leaves(stats), "mean-form stats expected"
        for j in range(4):
            np.testing.assert_array_equal(np.asarray(ys[j]),
                                          ys_ref[4 * c + j],
                                          err_msg=f"frame {4 * c + j}")
    # K NOT dividing the interval: refresh still happens at the first
    # chunk whose span crosses the interval (never later than one chunk)
    mb2 = FrameStepper(net, params, thresholds=taus, refresh_every=5,
                       out_map=out_map)
    mb2.step_chunk(clip[0:3])
    assert mb2._since_refresh == 3
    mb2.step_chunk(clip[3:6])       # 3 + 3 > 5 -> refresh prolog
    assert mb2._since_refresh == 3
    # mixing K=1 and chunk calls keeps one consistent frame counter
    y, _ = mb2(clip[6])
    assert mb2._t == 7


def test_frame_stepper_graph_net():
    """FrameStepper drives DAG nets through the identical contract."""
    from cbinfer_tpu.graph import GraphNode, convert_graph, init_graph_params
    nodes = [
        GraphNode("a", ConvSpec(features=8, threshold=0.02), ("input",)),
        GraphNode("b", ConvSpec(features=8, threshold=0.02), ("a",)),
    ]
    cfg = PipelineConfig(tile=TileConfig(tile_h=4, tile_w=4))
    net = convert_graph(nodes, (32, 48, 3), cfg, output="b")
    params = init_graph_params(nodes, (32, 48, 3), jax.random.PRNGKey(0))
    clip = SpriteVideo(SpriteVideoConfig(height=32, width=48, seed=5)).clip(4)
    ys_scan, _, _ = scan_video(net, params, jnp.asarray(clip))
    stepper = FrameStepper(net, params)
    for t in range(4):
        y, _ = stepper(clip[t])
        np.testing.assert_allclose(np.asarray(y), np.asarray(ys_scan[t]),
                                   atol=1e-5)


def test_mean_stats_match_stacked_means():
    """collect_stats="mean" (carry-accumulated deployment form) must equal
    the per-frame stacked stats' means exactly — same counters, same
    executable semantics — in plain, refresh_start, and refresh_every
    scans, and effective_flops must price both forms identically."""
    net, params, specs = _net()
    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=32, width=48, seed=3)).clip(6))
    for kw in ({}, {"refresh_start": True}, {"refresh_every": 3}):
        ys_a, _, stacked = scan_video(net, params, clip, **kw)
        ys_b, _, means = scan_video(net, params, clip,
                                    collect_stats="mean", **kw)
        np.testing.assert_array_equal(np.asarray(ys_a), np.asarray(ys_b))
        jax.tree.map(
            lambda s, m: np.testing.assert_allclose(
                np.mean(np.asarray(s, np.float64)), np.asarray(m),
                rtol=1e-6), stacked, means)
        ef_a = effective_flops(stacked, net.specs, (32, 48, 3), 4, 4)
        ef_b = effective_flops(means, net.specs, (32, 48, 3), 4, 4)
        assert np.isclose(ef_a["flop_reduction"], ef_b["flop_reduction"],
                          rtol=1e-6), (kw, ef_a, ef_b)


def test_frame_stepper_k1_dispatch_floor_knobs():
    """The K=1 dispatch-floor knobs (collect_stats packing, small-buffer
    carry arenas, bound params) are pure overhead optimizations — every
    combination must produce the baseline stepper's exact outputs across
    refreshes and mode mixes, and the packed stats must decode to the
    same counters the dict form reports."""
    from cbinfer_tpu.runner import unpack_stats

    net, params, _ = _net()
    clip = SpriteVideo(SpriteVideoConfig(height=32, width=48,
                                         seed=9)).clip(8)
    taus = [0.03, 0.03, 0.02, 0.02]
    ref = FrameStepper(net, params, thresholds=taus, refresh_every=4,
                       collect_stats=True)
    ys_ref, stats_ref = zip(*[ref(clip[t]) for t in range(8)])

    variants = {
        "packed_stats": dict(collect_stats="packed"),
        "no_stats": dict(collect_stats=False),
        "default_is_no_stats": {},
        "arena": dict(pack_small_buffers=1 << 20),   # packs every cache
        "arena_partial": dict(pack_small_buffers=8 * 32 * 48),
        "bound": dict(bind_params=True),
        "all": dict(collect_stats="packed", pack_small_buffers=1 << 20,
                    bind_params=True),
    }
    for name, kw in variants.items():
        s = FrameStepper(net, params, thresholds=taus, refresh_every=4,
                         **kw)
        for t in range(8):
            y, stats = s(clip[t])
            np.testing.assert_allclose(
                np.asarray(y), np.asarray(ys_ref[t]), atol=1e-6,
                err_msg=f"{name} frame {t}")
            if kw.get("collect_stats") == "packed":
                dec = unpack_stats(stats)
                refd = [d for d in stats_ref[t] if d]
                assert len(dec) == len(refd)
                for a, b in zip(dec, refd):
                    assert int(a["changed_tiles"]) == int(
                        np.asarray(b["changed_tiles"]))
            elif kw.get("collect_stats", False) is False:
                assert stats == []  # False is also the default
        # arena state must survive a mode mix (step_chunk) and reset
        if kw.get("pack_small_buffers"):
            ys_c, _ = s.step_chunk(jnp.asarray(clip[:4]))
            s.reset()
            y0, _ = s(clip[0])
            np.testing.assert_allclose(np.asarray(y0),
                                       np.asarray(ys_ref[0]), atol=1e-6)
