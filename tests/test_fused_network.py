"""Network-level fused consumer-detect (ConvSpec.fuse_next_detect).

convert_flagship marks plain-pallas conv->conv chains where the static
fuse gate holds; CBNet.apply then routes the producer through the fused
delta-conv+detect kernel and the consumer skips its detect stage via
hint.predetect. Streamed values and states must be BIT-identical to the
same net with the flags stripped (unfused kernels), and match the jnp
twin; the refresh prolog must compose.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from cbinfer_tpu.config import ConvSpec, PipelineConfig, PoolSpec, TileConfig
from cbinfer_tpu.convert import convert, convert_flagship
from cbinfer_tpu.network import init_params
from cbinfer_tpu.runner import scan_video
from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig

SPECS = [
    ConvSpec(features=8, threshold=0.02),                    # stem (policy)
    ConvSpec(features=8, threshold=0.03),                    # producer
    ConvSpec(features=8, threshold=0.04),                    # consumer+producer
    ConvSpec(features=8, threshold=0.02, kernel=(1, 1)),     # consumer
    ConvSpec(features=5, kernel=(1, 1), activation=None,
             threshold=0.02),                                # dense classifier
]
IN_SHAPE = (16, 24, 3)


def _nets():
    cfg_p = PipelineConfig(tile=TileConfig(8, 8), backend="pallas",
                           interpret=True)
    net_f = convert_flagship(SPECS, IN_SHAPE, cfg_p, fuse_detect=True)
    unfused = tuple(
        dataclasses.replace(s, fuse_next_detect=False)
        if isinstance(s, ConvSpec) else s for s in net_f.specs)
    net_u = dataclasses.replace(net_f, specs=unfused)
    cfg_j = PipelineConfig(tile=TileConfig(8, 8), backend="jnp")
    net_j = convert_flagship(SPECS, IN_SHAPE, cfg_j, fuse_detect=True)
    return net_f, net_u, net_j


def test_flagship_sets_fuse_flags():
    net_f, _, net_j = _nets()
    flags = [getattr(s, "fuse_next_detect", False) for s in net_f.specs]
    # layer 1 -> 2 and 2 -> 3 are plain-pallas conv->conv chains; the stem
    # (policy backend) and the pre-classifier conv (consumer is dense) are
    # not producers
    assert flags == [False, True, True, False, False], flags
    # the jnp twin never sets the flag (pallas-only kernel)
    assert not any(getattr(s, "fuse_next_detect", False)
                   for s in net_j.specs)
    # and WITHOUT the opt-in, the flagship converter never sets it (the
    # same-process A/B measured the fused kernel 0.99x on pose — the
    # shipped default is unfused; EXP_fused_ab.json)
    cfg_p = PipelineConfig(tile=TileConfig(8, 8), backend="pallas",
                           interpret=True)
    net_d = convert_flagship(SPECS, IN_SHAPE, cfg_p)
    assert not any(getattr(s, "fuse_next_detect", False)
                   for s in net_d.specs)


def test_fused_stream_bit_identical_to_unfused():
    net_f, net_u, net_j = _nets()
    params = init_params(SPECS, IN_SHAPE, jax.random.PRNGKey(3))
    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=16, width=24, seed=7, n_sprites=1, sprite_size=5)).clip(5))
    ys_f, st_f, stats_f = scan_video(net_f, params, clip)
    ys_u, st_u, stats_u = scan_video(net_u, params, clip)
    np.testing.assert_array_equal(np.asarray(ys_f), np.asarray(ys_u))
    for a, b in zip(jax.tree.leaves(st_f), jax.tree.leaves(st_u)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(stats_f), jax.tree.leaves(stats_u)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ys_j, _, _ = scan_video(net_j, params, clip)
    np.testing.assert_allclose(np.asarray(ys_f), np.asarray(ys_j),
                               atol=1e-5)


def test_fused_with_refresh_prolog():
    net_f, net_u, _ = _nets()
    params = init_params(SPECS, IN_SHAPE, jax.random.PRNGKey(4))
    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=16, width=24, seed=9, n_sprites=1, sprite_size=5)).clip(6))
    st_f = net_f.init_state()
    st_u = net_u.init_state()
    ys_f, st_f, _ = scan_video(net_f, params, clip[:3], state=st_f)
    ys_u, st_u, _ = scan_video(net_u, params, clip[:3], state=st_u)
    y2_f, _, _ = scan_video(net_f, params, clip[3:], state=st_f,
                            refresh_start=True)
    y2_u, _, _ = scan_video(net_u, params, clip[3:], state=st_u,
                            refresh_start=True)
    np.testing.assert_array_equal(np.asarray(y2_f), np.asarray(y2_u))


def test_fused_graph_dag_with_branching_reader():
    """DAG fusion (CBGraphNet): a producer read by TWO conv nodes fuses
    only its first topo-order only-input reader; the other reader gets the
    predetect stripped and re-detects off the hint. Bit-identical to the
    flag-stripped graph; close to the jnp twin."""
    from cbinfer_tpu.graph import (CBGraphNet, ConcatSpec, GraphNode,
                                   convert_graph_flagship, init_graph_params)

    nodes = [
        GraphNode("stem", ConvSpec(features=8, threshold=0.02), ("input",)),
        GraphNode("a", ConvSpec(features=8, threshold=0.03), ("stem",)),
        GraphNode("b", ConvSpec(features=8, threshold=0.03), ("a",)),
        GraphNode("c", ConvSpec(features=8, threshold=0.04), ("b",)),
        GraphNode("d", ConvSpec(features=8, threshold=0.05), ("b",)),
        GraphNode("cat", ConcatSpec(), ("c", "d")),
        GraphNode("out", ConvSpec(features=5, kernel=(1, 1),
                                  activation=None, threshold=0.02),
                  ("cat",)),
    ]
    cfg_p = PipelineConfig(tile=TileConfig(8, 8), backend="pallas",
                           interpret=True)
    net_f = convert_graph_flagship(nodes, IN_SHAPE, cfg_p,
                                   fuse_detect=True)
    flagged = [n.name for n in net_f.nodes
               if getattr(n.spec, "fuse_next_detect", False)]
    assert "a" in flagged and "b" in flagged, flagged
    assert net_f.fused_consumer_map()["b"] == "c"  # first reader wins
    unfused_nodes = tuple(
        dataclasses.replace(
            n, spec=dataclasses.replace(n.spec, fuse_next_detect=False))
        if isinstance(n.spec, ConvSpec) else n for n in net_f.nodes)
    net_u = dataclasses.replace(net_f, nodes=unfused_nodes)
    cfg_j = PipelineConfig(tile=TileConfig(8, 8), backend="jnp")
    net_j = convert_graph_flagship(nodes, IN_SHAPE, cfg_j,
                                   fuse_detect=True)

    params = init_graph_params(nodes, IN_SHAPE, jax.random.PRNGKey(6))
    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=16, width=24, seed=21, n_sprites=1, sprite_size=5)).clip(5))
    ys_f, st_f, _ = scan_video(net_f, params, clip)
    ys_u, st_u, _ = scan_video(net_u, params, clip)
    np.testing.assert_array_equal(np.asarray(ys_f), np.asarray(ys_u))
    for a, b in zip(jax.tree.leaves(st_f), jax.tree.leaves(st_u)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ys_j, _, _ = scan_video(net_j, params, clip)
    np.testing.assert_allclose(np.asarray(ys_f), np.asarray(ys_j),
                               atol=1e-5)


def test_fused_runtime_tau_vector():
    """Runtime thresholds must reach the fused kernel (the consumer's tau
    rides through FuseCtx): sweeping tau through the SAME compiled apply
    changes recompute counts and stays value-consistent with the unfused
    net at each point."""
    from cbinfer_tpu.convert import num_cb_layers

    net_f, net_u, _ = _nets()
    n = num_cb_layers(net_f.specs)
    params = init_params(SPECS, IN_SHAPE, jax.random.PRNGKey(5))
    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=16, width=24, seed=13, n_sprites=1, sprite_size=5)).clip(4))
    for tau in (0.0, 0.05):
        tv = jnp.full((n,), tau, jnp.float32)
        ys_f, _, sf = scan_video(net_f, params, clip, thresholds=tv)
        ys_u, _, su = scan_video(net_u, params, clip, thresholds=tv)
        np.testing.assert_array_equal(np.asarray(ys_f), np.asarray(ys_u))
        for a, b in zip(jax.tree.leaves(sf), jax.tree.leaves(su)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
