"""Benchmark harness (SURVEY.md C16): CB vs dense on identical inputs.

The reference times with CUDA events around the per-stage kernels and
reports fps + accuracy-vs-dense on real videos (arXiv 1808.05488 §VI).
Here: wall-clock with jax.block_until_ready, warmup excluded, frame-0 cold
start reported separately, per-layer change-rate histograms and
effective-FLOP accounting attached, results JSON-serializable in the
BASELINE.json metric convention (fps/chip; metric delta vs dense).
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import RunConfig
from .convert import CBNet
from .metrics import change_rate_histogram, effective_flops, miou, pck
from .runner import scan_video
from .video import SpriteVideo, SpriteVideoConfig


@dataclasses.dataclass
class BenchResult:
    dense_fps: float
    cb_fps: float
    speedup: float
    cold_start_ms: float
    flop_reduction: float
    metric_name: str
    metric_value: float          # CB-vs-dense agreement (1.0 = identical)
    change_rates: list
    config: Optional[dict] = None

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    def headline(self) -> Dict:
        """The driver's one-line metric (BASELINE.json:2)."""
        return {
            "metric": f"frames/sec/chip (CB path); {self.metric_name} vs "
                      "dense",
            "value": round(self.cb_fps, 3),
            "unit": "fps",
            "vs_baseline": round(self.speedup, 3),
        }


def _time_loop(fn, n_iters: int, *args) -> float:
    out = None
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iters


def bench_network(net: CBNet, params, frames: jnp.ndarray,
                  metric: str = "miou", num_classes: int = 8,
                  timed_reps: int = 3, run_config: Optional[RunConfig] = None
                  ) -> BenchResult:
    """Benchmark one model on one clip: dense baseline vs CB scan.

    frames: (T, H, W, C). The CB path is timed in steady state (caches warm,
    scan over the clip); the dense path times the same clip densely.
    """
    T = frames.shape[0]

    # ---- dense baseline ----
    dense_scan = jax.jit(
        lambda p, fs: jax.lax.map(lambda x: net.apply_dense(p, x), fs))
    dense_out = jax.block_until_ready(dense_scan(params, frames))
    dense_t = _time_loop(lambda: dense_scan(params, frames), timed_reps)
    dense_fps = T / dense_t

    # ---- CB path ----
    cb_scan = jax.jit(
        lambda p, fs, st: scan_video(net, p, fs, state=st),
        donate_argnums=(2,))
    # cold start (compile excluded): frame 0 from fresh state
    step = jax.jit(net.apply, donate_argnums=(1,))
    s0 = net.init_state()
    y0, s0, _ = step(params, s0, frames[0])
    jax.block_until_ready(y0)
    t0 = time.perf_counter()
    y0, s0, _ = step(params, net.init_state(), frames[0])
    jax.block_until_ready(y0)
    cold_ms = (time.perf_counter() - t0) * 1e3

    # warm the caches with one pass, then time the scan in steady state
    ys, state, stats = jax.block_until_ready(
        cb_scan(params, frames, net.init_state()))
    cb_out, state, stats = jax.block_until_ready(
        cb_scan(params, frames, state))
    t0 = time.perf_counter()
    for _ in range(timed_reps):
        _, state, _ = cb_scan(params, frames, state)
    jax.block_until_ready(state)
    cb_t = (time.perf_counter() - t0) / timed_reps
    cb_fps = T / cb_t

    # ---- accuracy + compute accounting ----
    if metric == "miou":
        mval = miou(np.asarray(cb_out), np.asarray(dense_out), num_classes)
    elif metric == "pck":
        mval = pck(np.asarray(cb_out), np.asarray(dense_out))
    else:
        raise ValueError(metric)
    ef = effective_flops(stats, net.specs, net.in_shape,
                         net.cfg.tile.tile_h, net.cfg.tile.tile_w)

    return BenchResult(
        dense_fps=dense_fps, cb_fps=cb_fps, speedup=cb_fps / dense_fps,
        cold_start_ms=cold_ms, flop_reduction=ef["flop_reduction"],
        metric_name=metric, metric_value=mval,
        change_rates=change_rate_histogram(stats),
        config=None if run_config is None else dataclasses.asdict(
            dataclasses.replace(run_config)),
    )


def make_clip(cfg: RunConfig) -> jnp.ndarray:
    video = SpriteVideo(SpriteVideoConfig(
        height=cfg.height, width=cfg.width, n_sprites=4,
        sprite_size=max(16, cfg.height // 15), speed=4.0, noise_std=0.002,
        seed=cfg.seed))
    return jnp.asarray(video.clip(cfg.frames))
