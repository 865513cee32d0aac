"""Graded-change video dynamics (round 5, VERDICT r4 missing #1).

The benign sprite distribution makes change detection binary in tau;
the graded dynamics (light drift / smooth noise / color pulsation) must
(a) preserve the generator contracts (determinism, idempotent frame
reads, [0,1] range, labels untouched) and (b) actually produce
tau-graded change — the property the whole r5 recalibration rests on.
"""

import numpy as np

from cbinfer_tpu.video import (GRADED_DYNAMICS, SpriteVideo,
                               SpriteVideoConfig, workload_video_kwargs)


def _graded_cfg(**kw):
    base = dict(height=64, width=96, n_sprites=2, sprite_size=12,
                speed=3.0, noise_std=0.002, seed=3, **GRADED_DYNAMICS)
    base.update(kw)
    return SpriteVideoConfig(**base)


def test_frame_reads_idempotent_and_deterministic():
    """frame() must be a pure read of (seed, frame_index): CB and dense
    paths render the same timestep independently, and tuner reruns must
    see identical videos."""
    a, b = SpriteVideo(_graded_cfg()), SpriteVideo(_graded_cfg())
    for _ in range(5):
        f1 = a.frame()
        f2 = a.frame()          # second read of the SAME timestep
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(f1, b.frame())
        a.step(), b.step()


def test_range_and_labels_stable_under_dynamics():
    v = SpriteVideo(_graded_cfg())
    for _ in range(8):
        f = v.frame()
        assert f.min() >= 0.0 and f.max() <= 1.0
        v.step()
    # labels depend only on sprite geometry, not on the photometric
    # dynamics: same seed with and without dynamics = same labels
    v1 = SpriteVideo(_graded_cfg())
    v2 = SpriteVideo(SpriteVideoConfig(height=64, width=96, n_sprites=2,
                                       sprite_size=12, speed=3.0,
                                       noise_std=0.002, seed=3))
    for _ in range(4):
        np.testing.assert_array_equal(v1.label(), v2.label())
        v1.step(), v2.step()


def test_change_is_tau_graded():
    """The defining property: the fraction of pixels whose frame-to-frame
    delta exceeds tau must fall SMOOTHLY as tau grows — not the benign
    distribution's step function. (Detection proper uses the accepted-
    value rule; raw consecutive-frame deltas are a sufficient proxy for
    gradedness here and keep the test model-free.)"""
    def exceed_fractions(cfg):
        v = SpriteVideo(cfg)
        f_prev = v.frame()
        fracs = []
        for _ in range(6):
            v.step()
            f = v.frame()
            d = np.abs(f - f_prev).max(axis=-1)
            fracs.append([float((d > t).mean())
                          for t in (0.015, 0.04, 0.1)])
            f_prev = f
        return np.mean(fracs, axis=0)

    benign = exceed_fractions(SpriteVideoConfig(
        height=64, width=96, n_sprites=2, sprite_size=12, speed=3.0,
        noise_std=0.002, seed=3))
    graded = exceed_fractions(_graded_cfg())
    # benign: every tau above the noise floor sees the same (sprite-only)
    # change -> ratio lo/hi near 1
    assert benign[0] / max(benign[2], 1e-9) < 2.0, benign
    # graded: small tau sees several times the change large tau sees
    assert graded[0] / max(graded[2], 1e-9) > 3.0, graded
    # and the middle point sits strictly between (monotone grading)
    assert graded[0] > graded[1] > graded[2], graded


def test_color_drift_never_flips_class():
    """color_drift is bounded so the nearest-palette-entry class of every
    sprite pixel is stable — label() stays the ground truth."""
    from cbinfer_tpu.video import CLASS_PALETTE_HARD
    v = SpriteVideo(_graded_cfg(palette="hard", light_drift=0.0,
                                noise_smooth_std=0.0, noise_std=0.0))
    for t in range(0, 96, 7):
        v.frame_index = t
        cols = v._sprite_colors_at(t)
        d = np.linalg.norm(CLASS_PALETTE_HARD[None] - cols[:, None],
                           axis=-1)
        assert (np.argmin(d, axis=1) + 1 == v.classes).all(), t


def test_workload_profiles():
    assert workload_video_kwargs("scene") == {}
    assert workload_video_kwargs("scene_hard") == {"palette": "hard"}
    # seg carries the accuracy-axis stress (hard palette); pose families
    # keep the default palette — keypoint-channel identity is keyed by
    # class color and proved unlearnable under the light drift on the
    # hard palette (video.py profile comment)
    assert workload_video_kwargs("seg")["palette"] == "hard"
    assert "palette" not in workload_video_kwargs("pose")
    for name in ("seg", "pose", "pose_graph"):
        vk = workload_video_kwargs(name)
        assert vk["light_drift"] > 0 and vk["noise_smooth_std"] > 0
        # profiles must be constructible
        SpriteVideoConfig(height=32, width=32, **vk)
    # "<base>_hard" convention works for bases without their own entry
    assert workload_video_kwargs("seg_hard")["palette"] == "hard"
    try:
        workload_video_kwargs("nope")
        assert False, "unknown workload must raise"
    except KeyError:
        pass
