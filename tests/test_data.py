"""Native data layer (C18) tests: builds lib, generates, prefetches."""

import numpy as np
import pytest

from cbinfer_tpu.data import (NativeSpriteVideo, PrefetchingSource,
                              make_video, native_available)
from cbinfer_tpu.video import SpriteVideoConfig


pytestmark = pytest.mark.skipif(not native_available(),
                                reason="libframegen.so not built")


def test_native_frames_valid_and_temporal():
    cfg = SpriteVideoConfig(height=64, width=96, n_sprites=2, sprite_size=8,
                            speed=3.0, seed=1)
    v = NativeSpriteVideo(cfg)
    clip = v.clip(6)
    assert clip.shape == (6, 64, 96, 3) and clip.dtype == np.float32
    assert 0.0 <= clip.min() and clip.max() <= 1.0 + 1e-5
    # static background: most pixels identical frame-to-frame
    changed = (np.abs(clip[1] - clip[0]).max(-1) > 1e-6).mean()
    assert 0 < changed < 0.2
    # deterministic in seed
    v2 = NativeSpriteVideo(cfg)
    np.testing.assert_array_equal(v2.clip(6), clip)


def test_prefetching_source():
    cfg = SpriteVideoConfig(height=32, width=32, n_sprites=1, sprite_size=4)
    src = PrefetchingSource(NativeSpriteVideo(cfg), depth=2)
    frames = [next(src) for _ in range(8)]
    src.close()
    assert len(frames) == 8
    assert not np.array_equal(frames[0], frames[4])


def test_make_video_fallback_interface():
    v = make_video(SpriteVideoConfig(height=16, width=16), prefer_native=False)
    assert v.clip(2).shape == (2, 16, 16, 3)
