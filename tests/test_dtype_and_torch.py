"""bf16 cache policy (SURVEY.md §7 memory budget) + torch weight import."""

import numpy as np
import jax
import jax.numpy as jnp

from cbinfer_tpu.config import ConvSpec, PipelineConfig, PoolSpec, TileConfig
from cbinfer_tpu.convert import convert, import_torch_state_dict
from cbinfer_tpu.network import dense_apply, init_params
from cbinfer_tpu.runner import scan_video
from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig


def test_bf16_caches_bounded_error():
    """bf16 caches with tau above bf16 quantization noise: pipeline runs,
    stays sparse, and output error vs fp32 dense stays O(tau)."""
    specs = [
        ConvSpec(features=8, threshold=0.05),
        PoolSpec(threshold=0.05),
        ConvSpec(features=5, kernel=(1, 1), activation=None, threshold=0.05),
    ]
    cfg = PipelineConfig(tile=TileConfig(tile_h=4, tile_w=4),
                         cache_dtype="bfloat16")
    net = convert(specs, (32, 48, 3), cfg)
    params = init_params(specs, (32, 48, 3), jax.random.PRNGKey(4))
    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=32, width=48, n_sprites=1, sprite_size=6, seed=12)).clip(6))
    ys, state, stats = scan_video(net, params, clip)
    assert state[0].in_cache.dtype == jnp.bfloat16
    # sparse after cold start (bf16 quantization must not mark everything)
    computed = np.asarray(stats[0]["computed_tiles"])
    assert computed[1:].max() < int(np.max(np.asarray(stats[0]["n_tiles"])))
    # bounded error vs dense fp32
    for t in (0, 3, 5):
        yd = dense_apply(specs, params, clip[t])
        err = float(jnp.max(jnp.abs(ys[t] - yd)))
        assert err < 1.5, err  # O(sum|w| * tau) bound, loose


def test_torch_state_dict_import_roundtrip():
    torch = __import__("torch")
    specs = [
        ConvSpec(features=8, kernel=(3, 3), threshold=0.0),
        PoolSpec(threshold=0.0),
        ConvSpec(features=5, kernel=(1, 1), activation=None, threshold=0.0),
    ]
    model = torch.nn.Sequential(
        torch.nn.Conv2d(3, 8, 3, padding=1),
        torch.nn.ReLU(),
        torch.nn.MaxPool2d(2),
        torch.nn.Conv2d(8, 5, 1),
    )
    params = import_torch_state_dict(specs, model.state_dict())
    assert params[0][0].shape == (3, 3, 3, 8)
    assert params[2][0].shape == (1, 1, 8, 5)

    # forward agreement: torch dense vs our dense path
    x = np.random.default_rng(5).random((16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        yt = model(torch.from_numpy(x.transpose(2, 0, 1))[None])
    yt = yt[0].numpy().transpose(1, 2, 0)
    yj = np.asarray(dense_apply(specs, params, jnp.asarray(x)))
    np.testing.assert_allclose(yj, yt, atol=1e-4)

    # and the converted CB net at tau=0 matches too
    net = convert(specs, (16, 16, 3), PipelineConfig(
        tile=TileConfig(tile_h=4, tile_w=4)))
    y, _, _ = net.apply(params, net.init_state(), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-4)


def test_torch_import_shape_mismatch_rejected():
    torch = __import__("torch")
    specs = [ConvSpec(features=8, kernel=(3, 3))]
    model = torch.nn.Sequential(torch.nn.Conv2d(3, 8, 5, padding=2))
    try:
        import_torch_state_dict(specs, model.state_dict())
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "does not match" in str(e)


def test_specs_from_torch_auto_walker():
    """specs_from_torch walks a nested torch module tree with zero
    hand-written specs (SURVEY.md C10; VERDICT r2 #4)."""
    import torch
    import torch.nn as nn
    from cbinfer_tpu.config import ConvSpec, PoolSpec, UpsampleSpec
    from cbinfer_tpu.convert import specs_from_torch
    from cbinfer_tpu.network import dense_apply

    model = nn.Sequential(
        nn.Conv2d(3, 16, 3, padding=1), nn.ReLU(),
        nn.MaxPool2d(2),
        nn.Sequential(  # nested container: recursed in order
            nn.Conv2d(16, 32, 3, padding=2, dilation=2), nn.ReLU(),
            nn.Conv2d(32, 32, 3, stride=2, padding=1), nn.ReLU(),
        ),
        nn.Dropout(0.5),
        nn.Conv2d(32, 8, 1),
        nn.Upsample(scale_factor=2, mode="nearest"),
    )
    model.eval()
    specs, params = specs_from_torch(model)
    kinds = [type(s).__name__ for s in specs]
    assert kinds == ["ConvSpec", "PoolSpec", "ConvSpec", "ConvSpec",
                     "ConvSpec", "UpsampleSpec"]
    assert specs[0].activation == "relu" and specs[4].activation is None
    assert specs[2].dilation == (2, 2) and specs[3].stride == (2, 2)
    assert isinstance(specs[1], PoolSpec) and isinstance(
        specs[5], UpsampleSpec)
    # numerical equivalence with the torch forward (NCHW vs HWC)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        yt = model(torch.from_numpy(
            x.transpose(2, 0, 1)[None]))[0].numpy().transpose(1, 2, 0)
    yj = np.asarray(dense_apply(specs, params, jnp.asarray(x)))
    np.testing.assert_allclose(yj, yt, atol=2e-5)


def test_specs_from_torch_rejects_unsupported():
    import torch.nn as nn
    import pytest
    from cbinfer_tpu.convert import specs_from_torch
    with pytest.raises(TypeError, match="Sigmoid"):
        specs_from_torch(nn.Sequential(nn.Conv2d(3, 4, 3, padding=1),
                                       nn.Sigmoid()))
    with pytest.raises(ValueError, match="grouped"):
        specs_from_torch(nn.Sequential(
            nn.Conv2d(4, 4, 3, padding=1, groups=4)))
    with pytest.raises(ValueError, match="ReLU"):
        specs_from_torch(nn.Sequential(nn.ReLU(), nn.Conv2d(3, 4, 3)))


def test_specs_from_torch_strided_explicit_padding():
    """Strided torch convs use symmetric padding, which differs from XLA
    SAME placement — the walker emits explicit (ph, pw) padding and the
    dense path matches torch exactly (ResNet-stem pattern)."""
    import torch
    import torch.nn as nn
    from cbinfer_tpu.convert import specs_from_torch
    from cbinfer_tpu.network import dense_apply

    model = nn.Sequential(
        nn.Conv2d(3, 8, 3, stride=2, padding=1), nn.ReLU(),
        nn.Conv2d(8, 8, 5, stride=2, padding=2), nn.ReLU(),
    )
    model.eval()
    specs, params = specs_from_torch(model)
    assert specs[0].padding == (1, 1) and specs[1].padding == (2, 2)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((30, 46, 3)).astype(np.float32)  # odd sizes
    with torch.no_grad():
        yt = model(torch.from_numpy(
            x.transpose(2, 0, 1)[None]))[0].numpy().transpose(1, 2, 0)
    yj = np.asarray(dense_apply(specs, params, jnp.asarray(x)))
    assert yj.shape == yt.shape
    np.testing.assert_allclose(yj, yt, atol=2e-5)


def test_explicit_padding_cb_matches_dense():
    """CB pipeline (jnp backend) on an explicit-padding spec chain equals
    its dense twin at tau=0 — the tile geometry handles (ph, pw) pads."""
    from cbinfer_tpu.config import ConvSpec, PipelineConfig, TileConfig
    from cbinfer_tpu.convert import convert
    from cbinfer_tpu.network import init_params
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig
    specs = [ConvSpec(features=8, kernel=(3, 3), stride=(2, 2),
                      padding=(1, 1), threshold=0.0),
             ConvSpec(features=8, kernel=(3, 3), padding=(1, 1),
                      threshold=0.0)]
    cfg = PipelineConfig(tile=TileConfig(tile_h=4, tile_w=4))
    net = convert(specs, (32, 48, 3), cfg)
    params = init_params(specs, (32, 48, 3), jax.random.PRNGKey(7))
    state = net.init_state()
    video = SpriteVideo(SpriteVideoConfig(height=32, width=48, seed=21))
    for frame in video.frames(3):
        x = jnp.asarray(frame)
        y, state, _ = net.apply(params, state, x)
        yd = net.apply_dense(params, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yd),
                                   atol=3e-4)


def test_specs_from_torch_batchnorm_folding():
    """BatchNorm2d folds exactly into the preceding conv at inference
    semantics — conv-bn-relu chains (incl. bias-free convs and
    affine=False BNs) convert with zero runtime cost."""
    import torch
    import torch.nn as nn
    from cbinfer_tpu.convert import specs_from_torch
    from cbinfer_tpu.network import dense_apply

    torch.manual_seed(7)
    model = nn.Sequential(
        nn.Conv2d(3, 16, 3, padding=1, bias=False),
        nn.BatchNorm2d(16), nn.ReLU(),
        nn.MaxPool2d(2),
        nn.Conv2d(16, 8, 3, padding=1),          # biased conv + affine BN
        nn.BatchNorm2d(8), nn.ReLU(),
        nn.Conv2d(8, 8, 1),
        nn.BatchNorm2d(8, affine=False),         # gamma=1, beta=0
    )
    # non-trivial running stats: a few training-mode batches
    model.train()
    with torch.no_grad():
        for _ in range(3):
            model(torch.randn(2, 3, 16, 16))
        # perturb affine params so folding must use them
        model[1].weight += 0.3 * torch.randn_like(model[1].weight)
        model[1].bias += 0.2 * torch.randn_like(model[1].bias)
    model.eval()

    specs, params = specs_from_torch(model)
    assert [type(s).__name__ for s in specs] == \
        ["ConvSpec", "PoolSpec", "ConvSpec", "ConvSpec"]
    assert specs[0].use_bias and specs[0].activation == "relu"

    rng = np.random.default_rng(1)
    x = rng.standard_normal((16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        yt = model(torch.from_numpy(
            x.transpose(2, 0, 1)[None]))[0].numpy().transpose(1, 2, 0)
    yj = np.asarray(dense_apply(specs, params, jnp.asarray(x)))
    assert yj.shape == yt.shape
    np.testing.assert_allclose(yj, yt, atol=2e-5)


def test_specs_from_torch_batchnorm_requires_conv():
    import torch.nn as nn
    import pytest
    from cbinfer_tpu.convert import specs_from_torch
    with pytest.raises(ValueError, match="BatchNorm2d"):
        specs_from_torch(nn.Sequential(nn.BatchNorm2d(3),
                                       nn.Conv2d(3, 4, 3)))


def test_specs_from_torch_flatten_only_at_tail():
    """A trailing Flatten is an inference no-op; a MID-network Flatten
    followed by spatial modules must raise (the layer IR is spatial
    throughout — silently dropping it would corrupt the network)."""
    import pytest
    import torch.nn as nn
    from cbinfer_tpu.convert import specs_from_torch

    specs, _ = specs_from_torch(nn.Sequential(
        nn.Conv2d(3, 4, 3, padding=1), nn.ReLU(), nn.Flatten()))
    assert len(specs) == 1  # tail Flatten dropped
    with pytest.raises(TypeError, match="after Flatten"):
        specs_from_torch(nn.Sequential(
            nn.Conv2d(3, 4, 3, padding=1), nn.Flatten(),
            nn.Conv2d(4, 4, 3, padding=1)))
