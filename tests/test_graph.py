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
