"""Threshold auto-tuner tests (SURVEY.md C13, §4 test 5 / configs[3])."""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from cbinfer_tpu.config import ConvSpec, PipelineConfig, PoolSpec, TileConfig
from cbinfer_tpu.convert import convert
from cbinfer_tpu.metrics import miou
from cbinfer_tpu.network import init_params
from cbinfer_tpu.runner import scan_video
from cbinfer_tpu.tuner import tune
from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig


def _setup():
    specs = [
        ConvSpec(features=8, threshold=0.0),
        PoolSpec(threshold=0.0),
        ConvSpec(features=8, threshold=0.0),
        ConvSpec(features=5, kernel=(1, 1), activation=None, threshold=0.0),
    ]
    cfg = PipelineConfig(tile=TileConfig(tile_h=4, tile_w=4))
    net = convert(specs, (32, 48, 3), cfg)
    params = init_params(specs, (32, 48, 3), jax.random.PRNGKey(2))
    clip = SpriteVideo(SpriteVideoConfig(height=32, width=48, n_sprites=2,
                                         sprite_size=8, noise_std=0.01,
                                         seed=4)).clip(8)
    return net, params, clip


def test_runtime_thresholds_match_static():
    """thresholds=vector must equal the same taus baked into the specs."""
    net, params, clip = _setup()
    taus = [0.03, 0.05, 0.02, 0.04]
    ys_dyn, _, _ = scan_video(net, params, jnp.asarray(clip),
                              thresholds=jnp.asarray(taus, jnp.float32))
    net_static = convert(net.specs, net.in_shape, net.cfg, thresholds=taus)
    ys_sta, _, _ = scan_video(net_static, params, jnp.asarray(clip))
    np.testing.assert_array_equal(np.asarray(ys_dyn), np.asarray(ys_sta))


def test_tune_produces_monotone_pareto():
    net, params, clip = _setup()
    metric = functools.partial(miou, num_classes=5)
    res = tune(net, params, clip, metric,
               tau_grid=(0.02, 0.05, 0.1, 0.3),
               budgets=(0.0, 0.05, 0.3), budget=0.05)
    assert len(res.thresholds) == 4
    assert all(t >= 0 for t in res.thresholds)
    # tighter budget => metric at least as high
    ms = [p["metric"] for p in sorted(res.pareto, key=lambda p: p["budget"])]
    assert ms[0] >= ms[-1] - 1e-9
    # zero budget keeps the metric perfect (base_tau=0 is exact)
    p0 = min(res.pareto, key=lambda p: p["budget"])
    assert p0["metric"] == 1.0
    # sensitivity curves exist for every layer and degrade with tau
    for l, curve in res.sensitivity.items():
        taus = [t for t, _ in curve]
        assert taus == sorted(taus)
    # the selected operating point must respect the budget on calib data
    assert 1.0 - res.metric <= 0.05 + 1e-9
    assert res.flop_reduction >= 1.0


def test_device_metrics_match_host():
    """miou_device / pck_device (tuner fast path) == host oracles."""
    from cbinfer_tpu.metrics import miou_device, pck_device
    rng = np.random.default_rng(3)
    a = rng.standard_normal((4, 16, 16, 5)).astype(np.float32)
    b = a + 0.5 * rng.standard_normal(a.shape).astype(np.float32)
    np.testing.assert_allclose(float(miou_device(jnp.asarray(a),
                                                 jnp.asarray(b), 5)),
                               miou(a, b, 5), atol=1e-6)
    hm_a = rng.standard_normal((3, 24, 24, 6)).astype(np.float32)
    hm_b = hm_a + 0.8 * rng.standard_normal(hm_a.shape).astype(np.float32)
    from cbinfer_tpu.metrics import pck
    np.testing.assert_allclose(float(pck_device(jnp.asarray(hm_a),
                                                jnp.asarray(hm_b))),
                               pck(hm_a, hm_b), atol=1e-6)


def test_tune_device_metric_fast_path_matches_host():
    net, params, clip = _setup()
    import functools as ft
    from cbinfer_tpu.metrics import miou_device
    kw = dict(tau_grid=(0.02, 0.05, 0.1, 0.3), budgets=(0.05,), budget=0.05)
    r_host = tune(net, params, clip, ft.partial(miou, num_classes=5), **kw)
    r_dev = tune(net, params, clip, ft.partial(miou, num_classes=5),
                 device_metric_fn=ft.partial(miou_device, num_classes=5),
                 **kw)
    assert r_host.thresholds == r_dev.thresholds
    np.testing.assert_allclose(r_host.metric, r_dev.metric, atol=1e-6)


def test_tau_is_dead_mirrors_runtime_gate():
    """_tau_is_dead must match layers.cb_pool_apply's fused-kernel gate:
    a forward-hint pool whose OUT extent is below the 8x8 tile falls back
    to re-detection at runtime (g.th = min(tile, out_h) < 8), so its tau
    is LIVE and must be swept."""
    import dataclasses
    from cbinfer_tpu.netview import NetView
    from cbinfer_tpu.tuner import _tau_is_dead

    def mk(in_shape, backend="pallas", fh=True):
        specs = [
            ConvSpec(features=128, threshold=0.0),
            dataclasses.replace(PoolSpec(window=(2, 2), stride=(2, 2),
                                         threshold=0.0), forward_hint=fh),
        ]
        cfg = PipelineConfig(tile=TileConfig(tile_h=8, tile_w=8),
                             backend=backend)
        return NetView.from_specs(specs, in_shape, cfg)

    # big map, aligned, CB producer, pallas -> fused kernel engages: DEAD
    v = mk((32, 64, 3))
    assert _tau_is_dead(v, 1)
    # out extent 8x16 -> pooled g.th = 8 ok; but in 8x16 -> out 4x8:
    # g.th = min(8, out_h=4) = 4 < 8 -> runtime re-detects: LIVE
    v = mk((8, 16, 3))
    assert not _tau_is_dead(v, 1)
    # jnp backend: fused kernel never engages: LIVE
    v = mk((32, 64, 3), backend="jnp")
    assert not _tau_is_dead(v, 1)
    # no forward_hint: plain CB pool: LIVE
    v = mk((32, 64, 3), fh=False)
    assert not _tau_is_dead(v, 1)


def test_stress_validate_prefers_first_passing_candidate():
    """tuned passes at tau=0 (exact); an absurd flat candidate after it
    must not displace it, and ordering must pick the first passing one."""
    from cbinfer_tpu.tuner import stress_validate
    net, params, clip = _setup()
    metric = functools.partial(miou, num_classes=5)
    res = stress_validate(
        net, params,
        {"tuned": [0.0, 0.0, 0.0, 0.0], "flat9": [9.0] * 4},
        clip, metric_fn=metric, budget=0.005)
    assert res.source == "tuned" and res.passed
    assert res.thresholds == [0.0, 0.0, 0.0, 0.0]
    assert [r["name"] for r in res.rows] == ["tuned", "flat9"]
    assert res.rows[0]["worst_degradation"] <= 0.005


def test_stress_validate_falls_back_when_tuned_fails():
    """A sabotaged 'tuned' vector (tau huge on every layer => caches never
    update => large degradation on moving video) must be rejected in favor
    of a later flat candidate that fits the budget; if nothing fits,
    passed=False and the least-degrading row ships."""
    from cbinfer_tpu.tuner import stress_validate
    net, params, clip = _setup()
    metric = functools.partial(miou, num_classes=5)
    res = stress_validate(
        net, params,
        {"tuned": [9.0] * 4, "flat0": [0.0] * 4},
        clip, metric_fn=metric, budget=0.005)
    assert res.rows[0]["worst_degradation"] > 0.005  # sabotage measured
    assert res.source == "flat0" and res.passed

    res2 = stress_validate(net, params, {"tuned": [9.0] * 4},
                           clip, metric_fn=metric, budget=0.005)
    assert not res2.passed and res2.source == "tuned"


def test_stress_validate_multi_clip_worst_and_labels():
    """(S,T,H,W,C) clip stacks + labels: worst-clip degradation gates the
    choice, and the labeled composite metric wires through."""
    from cbinfer_tpu.tuner import stress_validate
    net, params, _ = _setup()
    vids = [SpriteVideo(SpriteVideoConfig(height=32, width=48, n_sprites=2,
                                          sprite_size=8, noise_std=0.01,
                                          seed=s)) for s in (5, 6)]
    pairs = [v.clip_with_labels(8) for v in vids]
    clips = jnp.stack([jnp.asarray(f) for f, _ in pairs])
    labels = jnp.stack([jnp.asarray(l[:, ::2, ::2]) for _, l in pairs])

    from cbinfer_tpu.metrics import miou_labels

    def gt_metric(cb, dn, lab):
        return 1.0 - (miou_labels(dn, lab, 5) - miou_labels(cb, lab, 5))

    res = stress_validate(net, params, {"tuned": [0.0] * 4}, clips,
                          metric_fn=gt_metric, labels=labels, budget=0.005)
    assert res.passed
    assert len(res.rows[0]["per_clip_degradation"]) == 2
    assert res.rows[0]["worst_degradation"] == max(
        res.rows[0]["per_clip_degradation"])
