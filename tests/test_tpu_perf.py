"""TPU perf smoke (SURVEY.md §4 item 7): CB must beat dense on-chip.

Runs only with CBINFER_TPU_TESTS=1 (one real chip; CPU CI skips it via the
conftest marker hook). Asserts the essential perf contract at a modest
shape so the test stays fast: CB throughput > dense throughput on a
sparse-change clip, with zero capacity overflows.
"""

import time

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def on_tpu():
    if not any(d.platform == "tpu" for d in jax.devices()):
        pytest.skip("no TPU device")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    return True


def test_cb_beats_dense_360p(on_tpu):
    from cbinfer_tpu.config import PipelineConfig, TileConfig
    from cbinfer_tpu.convert import convert, num_cb_layers
    from cbinfer_tpu.models import get_model
    from cbinfer_tpu.network import init_params
    from cbinfer_tpu.runner import scan_video
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig

    H, W, T = 360, 640, 32
    specs = get_model("scene", num_classes=8, width=128)
    cfg = PipelineConfig(tile=TileConfig(8, 8, capacity_fraction=0.375),
                         backend="pallas", compute_dtype="bfloat16",
                         cache_dtype="bfloat16")
    net = convert(specs, (H, W, 3), cfg,
                  thresholds=[0.04] * num_cb_layers(
                      convert(specs, (H, W, 3), cfg,
                              dense_layers=[0]).specs),
                  dense_layers=[0])
    params = init_params(specs, (H, W, 3), jax.random.PRNGKey(0))
    clips = [jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=3, sprite_size=32, speed=4.0,
        noise_std=0.002, seed=s)).clip(T)) for s in (0, 1)]
    for c in clips:
        _ = float(jnp.sum(c))

    dense = jax.jit(lambda p, fs: jax.lax.map(
        lambda x: net.apply_dense(p, x), fs))
    d = dense(params, clips[0])
    _ = float(jnp.sum(d[-1]))
    t0 = time.perf_counter()
    d = dense(params, clips[1])
    _ = float(jnp.sum(d[-1]))
    t_dense = time.perf_counter() - t0

    cb = jax.jit(lambda p, fs, st: scan_video(net, p, fs, state=st),
                 donate_argnums=(2,))
    ys, st, stats = cb(params, clips[0], net.init_state())
    _ = float(jnp.sum(ys[-1]))
    t0 = time.perf_counter()
    ys, st, stats = cb(params, clips[1], st)
    _ = float(jnp.sum(ys[-1]))
    t_cb = time.perf_counter() - t0

    overflows = sum(int(np.asarray(s["overflow"]).sum())
                    for s in jax.device_get(stats) if s)
    assert overflows == 0
    assert t_cb < t_dense, (t_cb, t_dense)
