"""Real-video file ingestion (C18: the reference's OpenCV-decode role).

Y4M bytes are synthesized directly (no ffmpeg on this box) so the reader
is tested against a known-plane oracle.
"""

import io
import os

import numpy as np
import pytest

from cbinfer_tpu.fileio import ArrayVideo, Y4MVideo, open_video, _yuv_to_rgb


def _write_y4m(path, ys, us, vs, colorspace="C420jpeg", header_extra=""):
    h, w = ys[0].shape
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F30:1 Ip A1:1 {colorspace}"
                f"{header_extra}\n".encode())
        for y, u, v in zip(ys, us, vs):
            f.write(b"FRAME\n")
            f.write(y.astype(np.uint8).tobytes())
            f.write(u.astype(np.uint8).tobytes())
            f.write(v.astype(np.uint8).tobytes())


def test_y4m_420_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    h, w, n = 16, 24, 3
    ys = [rng.integers(16, 236, (h, w), dtype=np.uint8) for _ in range(n)]
    us = [rng.integers(16, 240, (h // 2, w // 2), dtype=np.uint8)
          for _ in range(n)]
    vs = [rng.integers(16, 240, (h // 2, w // 2), dtype=np.uint8)
          for _ in range(n)]
    p = tmp_path / "clip.y4m"
    _write_y4m(p, ys, us, vs)
    v = open_video(str(p))
    assert isinstance(v, Y4MVideo)
    assert (v.height, v.width) == (h, w) and v.fps == 30.0
    clip = v.clip(n)
    assert clip.shape == (n, h, w, 3) and clip.dtype == np.float32
    assert clip.min() >= 0.0 and clip.max() <= 1.0
    # oracle: nearest-upsampled chroma through the same matrix
    for i in range(n):
        uu = np.repeat(np.repeat(us[i], 2, 0), 2, 1)
        vv = np.repeat(np.repeat(vs[i], 2, 0), 2, 1)
        np.testing.assert_allclose(clip[i], _yuv_to_rgb(ys[i], uu, vv),
                                   atol=1e-6)
    with pytest.raises(EOFError):
        v.frame()
    v.close()


def test_y4m_444_and_loop(tmp_path):
    h, w = 8, 8
    ys = [np.full((h, w), 100 + 20 * i, np.uint8) for i in range(2)]
    cs = [np.full((h, w), 128, np.uint8) for _ in range(2)]
    p = tmp_path / "c444.y4m"
    _write_y4m(p, ys, cs, cs, colorspace="C444")
    v = Y4MVideo(str(p), loop=True)
    clip = v.clip(5)  # wraps: frames 0 1 0 1 0
    np.testing.assert_allclose(clip[0], clip[2], atol=1e-6)
    np.testing.assert_allclose(clip[1], clip[3], atol=1e-6)
    assert not np.allclose(clip[0], clip[1])
    v.close()


def test_y4m_rejects_bad_input(tmp_path):
    p = tmp_path / "bad.y4m"
    p.write_bytes(b"RIFFnot a y4m\n")
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        Y4MVideo(str(p))
    p2 = tmp_path / "c422.y4m"
    _write_y4m(p2, [np.zeros((4, 4), np.uint8)],
               [np.zeros((4, 2), np.uint8)], [np.zeros((4, 2), np.uint8)],
               colorspace="C422")
    with pytest.raises(ValueError, match="unsupported Y4M colorspace"):
        Y4MVideo(str(p2))


def test_array_video(tmp_path):
    clip8 = (np.random.default_rng(1).random((4, 8, 12, 3)) * 255
             ).astype(np.uint8)
    p = tmp_path / "clip.npy"
    np.save(p, clip8)
    v = open_video(str(p), loop=True)
    assert isinstance(v, ArrayVideo)
    got = v.clip(6)  # wraps
    np.testing.assert_allclose(got[:4], clip8.astype(np.float32) / 255.0)
    np.testing.assert_allclose(got[4], got[0])
    pz = tmp_path / "clip.npz"
    np.savez(pz, frames=clip8)
    assert open_video(str(pz)).clip(4).shape == (4, 8, 12, 3)
    with pytest.raises(ValueError, match="unsupported video container"):
        open_video("clip.mp4")


def test_file_video_feeds_pipeline(tmp_path):
    """A file-sourced clip drives the CB scan runner unchanged."""
    import jax.numpy as jnp
    from cbinfer_tpu.config import ConvSpec, PipelineConfig, TileConfig
    from cbinfer_tpu.convert import convert
    from cbinfer_tpu.network import init_params
    from cbinfer_tpu.runner import scan_video
    import jax

    rng = np.random.default_rng(2)
    base = rng.random((16, 24, 3), np.float32)
    frames = np.stack([base] * 3)
    frames[1, :4, :4] += 0.5
    frames[2, 8:12, 8:12] += 0.5
    np.save(tmp_path / "cam.npy", np.clip(frames, 0, 1))
    v = open_video(str(tmp_path / "cam.npy"))
    specs = [ConvSpec(features=8, kernel=(3, 3))]
    cfg = PipelineConfig(tile=TileConfig(4, 4), backend="jnp",
                         compute_dtype="float32", cache_dtype="float32")
    net = convert(specs, (16, 24, 3), cfg)
    params = init_params(specs, (16, 24, 3), jax.random.PRNGKey(0))
    ys, st, stats = scan_video(net, params, jnp.asarray(v.clip(3)),
                               thresholds=jnp.asarray([0.01]))
    assert ys.shape[0] == 3
    ct = np.asarray(stats[0]["computed_tiles"])
    assert ct[0] == np.asarray(stats[0]["n_tiles"])[0]  # cold start: all
    assert (ct[1:] < ct[0]).all()                    # then sparse


def test_y4m_odd_dims(tmp_path):
    """Odd-dimension 4:2:0 stores ceil(H/2) x ceil(W/2) chroma planes; a
    floor-sized read desyncs every later FRAME boundary."""
    h, w = 15, 21
    ch, cw = (h + 1) // 2, (w + 1) // 2
    rng = np.random.default_rng(3)
    ys = [rng.integers(16, 236, (h, w), dtype=np.uint8) for _ in range(2)]
    us = [rng.integers(16, 240, (ch, cw), dtype=np.uint8) for _ in range(2)]
    vs = [rng.integers(16, 240, (ch, cw), dtype=np.uint8) for _ in range(2)]
    p = tmp_path / "odd.y4m"
    _write_y4m(p, ys, us, vs)
    v = Y4MVideo(str(p))
    clip = v.clip(2)
    assert clip.shape == (2, h, w, 3)
    uu = np.repeat(np.repeat(us[1], 2, 0), 2, 1)[:h, :w]
    vv = np.repeat(np.repeat(vs[1], 2, 0), 2, 1)[:h, :w]
    np.testing.assert_allclose(clip[1], _yuv_to_rgb(ys[1], uu, vv),
                               atol=1e-6)
    v.close()


def test_prefetching_source_finite_file_terminates(tmp_path):
    """A finite (non-loop) file source drained through PrefetchingSource
    raises StopIteration instead of deadlocking the consumer (the EOFError
    used to kill the producer thread silently)."""
    from cbinfer_tpu.data import PrefetchingSource

    clip = np.zeros((3, 4, 6, 3), np.float32)
    np.save(tmp_path / "c.npy", clip)
    src = PrefetchingSource(open_video(str(tmp_path / "c.npy")))
    got = list(src)  # must terminate
    assert len(got) == 3
    src.close()


def test_write_y4m_round_trip(tmp_path):
    """write_y4m (C444) -> Y4MVideo must reproduce frames within 8-bit
    quantization — the serialization half of the real-footage story:
    native framegen output becomes a standard container the CLI ingests."""
    from cbinfer_tpu.fileio import write_y4m
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig

    clip = SpriteVideo(SpriteVideoConfig(height=48, width=64, n_sprites=2,
                                         sprite_size=10, seed=4)).clip(3)
    path = str(tmp_path / "clip.y4m")
    write_y4m(path, clip, fps=30)
    v = open_video(path)
    assert (v.height, v.width) == (48, 64)
    assert v.colorspace == "C444"
    got = v.clip(3)
    v.close()
    # BT.601 8-bit round trip: limited-range quantization step is 1/219
    assert np.abs(got - clip).max() < 2.5 / 219.0, np.abs(got - clip).max()
