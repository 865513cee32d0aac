"""Workload zoo: one-call loading of the shipped model families."""

import dataclasses
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cbinfer_tpu import zoo
from cbinfer_tpu.config import PipelineConfig, TileConfig


def _cfg():
    return PipelineConfig(tile=TileConfig(8, 8), backend="jnp",
                          compute_dtype="float32", cache_dtype="float32")


@pytest.mark.parametrize("name", zoo.names())
def test_load_all_registered(name):
    wl = zoo.load(name, (96, 128, 3), _cfg())
    assert wl.kind in ("sequential", "graph")
    assert len(wl.taus) > 0 and wl.metric in ("miou", "pck")
    # trained ckpts + tuned taus exist in-repo for every registered family
    assert wl.weights == "trained(npz)", wl.warnings
    assert wl.tau_source == "tuned", wl.warnings


def test_zoo_scene_streams():
    from cbinfer_tpu.runner import scan_video
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig
    wl = zoo.load("scene", (96, 128, 3), _cfg())
    clip = jnp.asarray(SpriteVideo(SpriteVideoConfig(
        height=96, width=128, seed=5, n_sprites=2)).clip(3))
    ys, st, stats = scan_video(wl.net, wl.params, clip,
                               thresholds=jnp.asarray(wl.taus, jnp.float32))
    assert ys.shape[0] == 3


def test_zoo_flat_tau_and_upsample_strip():
    wl = zoo.load("seg", (96, 128, 3), _cfg(), tau=0.02)
    assert wl.tau_source == "fixed(0.02)"
    assert all(t == 0.02 for t in wl.taus)
    # seg's trailing nearest upsample is stripped and recorded
    assert wl.upsample_scale is not None
    full = zoo.load("seg", (96, 128, 3), _cfg(),
                    strip_trailing_upsample=False)
    assert full.upsample_scale is None


def test_zoo_policy_applied(tmp_path, monkeypatch):
    pol = tmp_path / "POLICY_scene.json"
    pol.write_text(json.dumps({"overrides": {"4": "dense_cached"}}))
    e = zoo.REGISTRY["scene"]
    monkeypatch.setitem(zoo.REGISTRY, "scene",
                        dataclasses.replace(e, policy_json=str(pol)))
    wl = zoo.load("scene", (96, 128, 3), _cfg())
    assert wl.policy_source == str(pol)
    assert wl.net.specs[4].backend == "dense_cached"
    off = zoo.load("scene", (96, 128, 3), _cfg(), apply_policy=False)
    assert off.policy_source == "none"
    assert off.net.specs[4].backend is None


def test_zoo_unknown_name():
    with pytest.raises(KeyError, match="unknown workload"):
        zoo.load("resnet50")


def test_zoo_missing_artifacts_degrade_loudly(tmp_path, monkeypatch):
    """Missing checkpoint/tau files fall back to random weights / default
    taus with provenance + warnings recorded — never silently."""
    e = zoo.REGISTRY["scene"]
    monkeypatch.setitem(
        zoo.REGISTRY, "scene",
        dataclasses.replace(e, npz=str(tmp_path / "missing.npz"),
                            tau_json=str(tmp_path / "missing.json")))
    wl = zoo.load("scene", (96, 128, 3), _cfg())
    assert wl.weights.startswith("random")
    assert wl.tau_source == "fixed(0.04)"
    assert len(wl.warnings) == 2


def test_zoo_stale_policy_degrades_gracefully(tmp_path, monkeypatch):
    """A policy file measured on an older architecture (out-of-range
    layer index) must not kill the load: warn, record policy 'none'."""
    pol = tmp_path / "POLICY_scene.json"
    pol.write_text(json.dumps({"overrides": {"99": "dense_cached"}}))
    e = zoo.REGISTRY["scene"]
    monkeypatch.setitem(zoo.REGISTRY, "scene",
                        dataclasses.replace(e, policy_json=str(pol)))
    wl = zoo.load("scene", (96, 128, 3), _cfg())
    assert wl.policy_source == "none"
    assert any("policy NOT applied" in w for w in wl.warnings)


def test_zoo_stale_tau_file_hard_fails(tmp_path, monkeypatch):
    """A PRESENT tau file whose count no longer matches the architecture
    is a hard error (publishing rows at uncalibrated flat taus would be
    worse than crashing); a MISSING file still degrades."""
    tj = tmp_path / "tau.json"
    tj.write_text(json.dumps({"thresholds": [0.1, 0.1]}))
    e = zoo.REGISTRY["scene"]
    monkeypatch.setitem(zoo.REGISTRY, "scene",
                        dataclasses.replace(e, tau_json=str(tj)))
    with pytest.raises(ValueError, match="stale tau file"):
        zoo.load("scene", (96, 128, 3), _cfg())


def test_load_refresh_cadence_parity_guard(tmp_path, monkeypatch):
    """The validated refresh cadence applies ONLY at the chunk size and
    resolution it was measured at (drift per chunk scales with both);
    any mismatch, absence, or corruption degrades to the conservative
    default with the reason in the source string."""
    monkeypatch.setattr(zoo, "_REPO", str(tmp_path))
    assert zoo.load_refresh_cadence("m", 32, 720, 1280) == (2, "default")
    p = tmp_path / "REFRESH_m.json"
    p.write_text(json.dumps({"refresh_every_chunks": 4, "T": 32,
                             "shape": [720, 1280]}))
    cad, src = zoo.load_refresh_cadence("m", 32, 720, 1280)
    assert cad == 4 and src == str(p)
    cad, src = zoo.load_refresh_cadence("m", 16, 720, 1280)
    assert cad == 2 and "measured at T=32" in src
    cad, src = zoo.load_refresh_cadence("m", 32, 360, 640)
    assert cad == 2 and "default" in src
    p.write_text("{broken")
    cad, src = zoo.load_refresh_cadence("m", 32, 720, 1280)
    assert cad == 2 and "unreadable" in src


def test_default_pipeline_config_platform_aware():
    """zoo.load with no cfg builds the deployment config for the platform:
    pallas/bf16 on TPU, jnp/f32 elsewhere (before r3 it always built the
    jnp debug path — a measured 70x cliff at 720p on the chip)."""
    cfg = zoo.default_pipeline_config()
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if on_tpu:
        assert cfg.backend == "pallas"
        assert cfg.compute_dtype == cfg.cache_dtype == "bfloat16"
    else:
        assert cfg.backend == "jnp"
        assert cfg.compute_dtype == cfg.cache_dtype == "float32"
    assert (cfg.tile.tile_h, cfg.tile.tile_w) == (8, 8)
    assert cfg.tile.capacity_fraction == 0.375
    # the loader consumes it: a no-cfg load must equal an explicit one
    wl = zoo.load("scene", (96, 128, 3))
    assert wl.net is not None
