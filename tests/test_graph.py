"""DAG network (graph.py) tests: concat topology, hint merging, pose model."""

import numpy as np
import jax
import jax.numpy as jnp

from cbinfer_tpu.config import ConvSpec, PipelineConfig, PoolSpec, TileConfig
from cbinfer_tpu.graph import (ConcatSpec, GraphNode, convert_graph,
                               init_graph_params, node_out_shapes)
from cbinfer_tpu.models.pose import pose_graph
from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig


def _cfg(**kw):
    return PipelineConfig(tile=TileConfig(tile_h=4, tile_w=4), **kw)


def _branchy_nodes():
    return [
        GraphNode("c1", ConvSpec(features=8, threshold=0.02), ("input",)),
        GraphNode("p1", PoolSpec(threshold=0.02), ("c1",)),
        GraphNode("a", ConvSpec(features=8, threshold=0.02), ("p1",)),
        GraphNode("b", ConvSpec(features=4, threshold=0.02), ("p1",)),
        GraphNode("cat", ConcatSpec(), ("p1", "a", "b")),
        GraphNode("head", ConvSpec(features=5, kernel=(1, 1),
                                   activation=None, threshold=0.02), ("cat",)),
    ]


def test_shapes_and_params():
    nodes = _branchy_nodes()
    shapes = node_out_shapes(nodes, (32, 48, 3))
    assert shapes["cat"] == (16, 24, 8 + 8 + 4)
    assert shapes["head"] == (16, 24, 5)
    params = init_graph_params(nodes, (32, 48, 3), jax.random.PRNGKey(0))
    assert params["head"][0].shape == (1, 1, 20, 5)


def test_graph_cb_matches_dense_at_tau0():
    nodes = [GraphNode(n.name, n.spec.__class__(**{
        **{f.name: getattr(n.spec, f.name)
           for f in n.spec.__dataclass_fields__.values()},
        **({"threshold": 0.0} if hasattr(n.spec, "threshold") else {})}),
        n.inputs) if not isinstance(n.spec, ConcatSpec) else n
        for n in _branchy_nodes()]
    net = convert_graph(nodes, (32, 48, 3), _cfg())
    params = init_graph_params(nodes, (32, 48, 3), jax.random.PRNGKey(1))
    state = net.init_state()
    step = jax.jit(net.apply)
    video = SpriteVideo(SpriteVideoConfig(height=32, width=48, seed=10))
    for frame in video.frames(4):
        x = jnp.asarray(frame)
        y, state, stats = step(params, state, x)
        yd = net.apply_dense(params, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yd), atol=3e-4)


def test_graph_cb_sparse_after_cold_start():
    nodes = _branchy_nodes()
    net = convert_graph(nodes, (32, 48, 3), _cfg())
    params = init_graph_params(nodes, (32, 48, 3), jax.random.PRNGKey(2))
    state = net.init_state()
    step = jax.jit(net.apply)
    video = SpriteVideo(SpriteVideoConfig(height=32, width=48, n_sprites=1,
                                          sprite_size=6, seed=11))
    for t, frame in enumerate(video.frames(3)):
        y, state, stats = step(params, state, jnp.asarray(frame))
        if t > 0:
            for name in ("a", "b", "head"):
                s = stats[name]
                assert int(s["computed_tiles"]) < int(np.max(np.asarray(
                    s["n_tiles"]))), name


def test_graph_refresh_equals_dense():
    """apply_refresh on a DAG: output equals dense, caches fully accepted,
    and scan_video's refresh policies work on graph nets (VERDICT r2 #3)."""
    from cbinfer_tpu.runner import scan_video
    nodes = _branchy_nodes()
    net = convert_graph(nodes, (32, 48, 3), _cfg())
    params = init_graph_params(nodes, (32, 48, 3), jax.random.PRNGKey(4))
    video = SpriteVideo(SpriteVideoConfig(height=32, width=48, n_sprites=2,
                                          sprite_size=6, speed=3.0, seed=12))
    clip = jnp.asarray(video.clip(6))
    # refresh frame output == dense output, bit-for-bit cache acceptance
    state = net.init_state()
    y, state, stats = jax.jit(net.apply_refresh)(params, state, clip[0])
    yd = net.apply_dense(params, clip[0])
    np.testing.assert_allclose(np.asarray(y), np.asarray(yd), atol=3e-4)
    for name in ("c1", "p1", "a", "b", "head"):
        assert int(stats[name]["computed_tiles"]) == int(np.max(np.asarray(
            stats[name]["n_tiles"]))), name
    # periodic refresh via scan_video: equals per-frame dense within drift
    ys, _, st = scan_video(net, params, clip, refresh_every=3)
    dn = np.stack([np.asarray(net.apply_dense(params, f)) for f in clip])
    np.testing.assert_allclose(np.asarray(ys), dn, atol=0.1)
    # refresh frames (t=0,3) computed everything
    ct = np.asarray(st["head"]["computed_tiles"])
    nt = int(np.max(np.asarray(st["head"]["n_tiles"])))
    assert ct[0] == nt and ct[3] == nt
    # refresh_start prolog mode
    ys2, _, _ = scan_video(net, params, clip, state=net.init_state(),
                           refresh_start=True)
    np.testing.assert_allclose(np.asarray(ys2), dn, atol=0.1)


def test_graph_flagship_policy():
    from cbinfer_tpu.graph import convert_graph_flagship
    nodes, out = pose_graph(num_keypoints=4, num_pafs=6, width=8, stages=2)
    net = convert_graph_flagship(nodes, (64, 64, 3), _cfg(), output=out)
    byname = {n.name: n.spec for n in net.nodes}
    # stem reads the 3-channel input -> dense_cached
    assert byname["bb0"].backend == "dense_cached"
    # final-stage head 1x1s have no CB descendants -> plain dense (cascade)
    assert not byname["s2_paf_out"].use_cb
    assert not byname["s2_heat_out"].use_cb
    assert not byname["s2_paf_1x1"].use_cb
    # stage-1 head 1x1s feed stage 2 (CB) -> stay CB
    assert byname["s1_paf_out"].use_cb
    # aligned pools forward their hint
    assert byname["bb2"].forward_hint
    # converted net still matches its dense twin at cold start
    params = init_graph_params(net.nodes, (64, 64, 3), jax.random.PRNGKey(5))
    y, _, _ = jax.jit(net.apply)(params, net.init_state(),
                                 jnp.zeros((64, 64, 3)))
    yd = net.apply_dense(params, jnp.zeros((64, 64, 3)))
    np.testing.assert_allclose(np.asarray(y), np.asarray(yd), atol=3e-4)


def test_tune_on_graph_net():
    """The threshold tuner accepts a CBGraphNet (VERDICT r2 #3)."""
    import functools
    from cbinfer_tpu.metrics import miou
    from cbinfer_tpu.tuner import tune
    nodes = _branchy_nodes()
    net = convert_graph(nodes, (32, 48, 3), _cfg())
    params = init_graph_params(nodes, (32, 48, 3), jax.random.PRNGKey(6))
    clip = SpriteVideo(SpriteVideoConfig(height=32, width=48, n_sprites=2,
                                         sprite_size=8, noise_std=0.01,
                                         seed=13)).clip(6)
    res = tune(net, params, clip, functools.partial(miou, num_classes=5),
               tau_grid=(0.02, 0.05, 0.1), budgets=(0.0, 0.05), budget=0.05)
    assert len(res.thresholds) == net.num_cb_layers()
    assert 1.0 - res.metric <= 0.05 + 1e-9
    assert res.flop_reduction >= 1.0
    # tuned taus round-trip through convert_graph
    net2 = convert_graph(nodes, (32, 48, 3), _cfg(),
                         thresholds=res.thresholds)
    assert net2.num_cb_layers() == len(res.thresholds)


def test_pose_graph_builds_and_runs():
    nodes, out = pose_graph(num_keypoints=4, num_pafs=6, width=8, stages=2)
    net = convert_graph(nodes, (64, 64, 3), _cfg(), output=out)
    shapes = node_out_shapes(nodes, (64, 64, 3))
    assert shapes[out] == (8, 8, 10)  # stride 8, 4+6 channels
    # stage-2 concat consumes backbone + both stage-1 branches
    cat = [n for n in nodes if n.name == "s2_cat"][0]
    assert set(cat.inputs) == {"bb11", "s1_paf_out", "s1_heat_out"}
    params = init_graph_params(nodes, (64, 64, 3), jax.random.PRNGKey(3))
    state = net.init_state()
    y, state, stats = jax.jit(net.apply)(params, state,
                                         jnp.zeros((64, 64, 3)))
    assert y.shape == (8, 8, 10)
    yd = net.apply_dense(params, jnp.zeros((64, 64, 3)))
    np.testing.assert_allclose(np.asarray(y), np.asarray(yd), atol=3e-4)


def test_graph_flagship_extra_overrides():
    """Node-name-keyed measured-policy overrides (optimize_policy's DAG
    hook): layered on top of the flagship policy, win on conflicts, and
    keep the CB-layer count (tuned tau files stay valid)."""
    from cbinfer_tpu.graph import convert_graph_flagship
    nodes, out = pose_graph(num_keypoints=4, num_pafs=6, width=8, stages=2)
    base = convert_graph_flagship(nodes, (64, 64, 3), _cfg(), output=out)
    net = convert_graph_flagship(
        nodes, (64, 64, 3), _cfg(), output=out,
        extra_overrides={"s1_paf_c1": "dense_cached"})
    byname = {n.name: n.spec for n in net.nodes}
    assert byname["s1_paf_c1"].backend == "dense_cached"
    assert net.num_cb_layers() == base.num_cb_layers()
    # the special "forward_hint" value flips mask-forwarding, not backend
    net_fh = convert_graph_flagship(
        nodes, (64, 64, 3), _cfg(), output=out,
        extra_overrides={"s1_paf_c1": "forward_hint"})
    fh_spec = {n.name: n.spec for n in net_fh.nodes}["s1_paf_c1"]
    assert fh_spec.forward_hint and fh_spec.backend is None
    assert net_fh.num_cb_layers() == base.num_cb_layers()
    # overridden net still streams to the same values as the base net
    params = init_graph_params(net.nodes, (64, 64, 3), jax.random.PRNGKey(6))
    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=64, width=64, seed=13, n_sprites=1, sprite_size=9)).clip(3))
    from cbinfer_tpu.runner import scan_video
    taus = jnp.full((net.num_cb_layers(),), 0.02, jnp.float32)
    ys_a, _, _ = scan_video(base, params, clip, thresholds=taus)
    ys_b, _, _ = scan_video(net, params, clip, thresholds=taus)
    np.testing.assert_allclose(np.asarray(ys_a), np.asarray(ys_b),
                               atol=1e-5)


def test_graph_flagship_patch_stem_policy():
    """On a pallas pipeline whose stem satisfies the flat4 gate,
    convert_graph_flagship picks the sparse patch_stem backend (the same
    measured policy as convert.flagship_layers), and swapping the stem
    back to dense_cached on the SAME pipeline is value-exact in f32.
    (Comparing against the jnp twin instead would also fold in the
    documented forward_hint pool backend asymmetry — pool tau is dead on
    pallas fused pools, live on jnp — which is not what this test is
    about.)"""
    from cbinfer_tpu.graph import convert_graph_flagship
    from cbinfer_tpu.runner import scan_video
    nodes, out = pose_graph(num_keypoints=4, num_pafs=6, width=8, stages=2)
    # 8-divisible H, 32-divisible W -> flat4 gate holds
    cfg_p = PipelineConfig(tile=TileConfig(tile_h=8, tile_w=8),
                           backend="pallas", interpret=True)
    net_p = convert_graph_flagship(nodes, (16, 64, 3), cfg_p, output=out)
    byname = {n.name: n.spec for n in net_p.nodes}
    assert byname["bb0"].backend == "patch_stem"
    # jnp pipelines (and the CPU dryrun) keep dense_cached
    net_j = convert_graph_flagship(nodes, (16, 64, 3), _cfg(), output=out)
    assert {n.name: n.spec for n in net_j.nodes}["bb0"].backend \
        == "dense_cached"
    net_d = convert_graph_flagship(nodes, (16, 64, 3), cfg_p, output=out,
                                   extra_overrides={"bb0": "dense_cached"})
    params = init_graph_params(nodes, (16, 64, 3), jax.random.PRNGKey(7))
    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=16, width=64, seed=3, n_sprites=1, sprite_size=5)).clip(3))
    taus = jnp.full((net_p.num_cb_layers(),), 0.02, jnp.float32)
    ys_p, _, st_p = scan_video(net_p, params, clip, thresholds=taus)
    ys_d, _, _ = scan_video(net_d, params, clip, thresholds=taus)
    np.testing.assert_array_equal(np.asarray(ys_p), np.asarray(ys_d))
    ct = np.asarray(st_p["bb0"]["computed_tiles"])
    assert ct[0] == ct.max() and ct[-1] < ct[0]
