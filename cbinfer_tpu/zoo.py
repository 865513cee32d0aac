"""Workload zoo: one-call loading of the shipped model families.

The reference ships pretrained torch models plus per-model threshold
files and expects the user to wire them together by hand (SURVEY.md C17,
[CB19 §VI]). Here a single registry maps each workload name to its
architecture, in-repo-trained checkpoint, tuned threshold vector, and
measured per-layer backend policy, so user code (and the repo's own
bench/eval/tuning scripts) builds a ready-to-stream network in one call:

    wl = zoo.load("pose", (720, 1280, 3), cfg)
    ys, st, stats = scan_video(wl.net, wl.params, clip,
                               thresholds=wl.taus)

Missing artifacts degrade loudly-but-gracefully (random weights / default
taus / no policy), with provenance recorded on the returned Workload —
the same contract bench.py established for the headline run.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

from .config import PipelineConfig, TileConfig, UpsampleSpec

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CK = os.path.join(_REPO, "ckpts")


def default_pipeline_config() -> PipelineConfig:
    """The deployment PipelineConfig for the current platform.

    On a TPU: the flagship operating configuration every shipped tau
    vector and backend policy was calibrated against (pallas kernels,
    bf16 compute/caches, 8x8 tiles, capacity 0.375 — bench.py's exact
    construction). Elsewhere: the portable jnp/float32 twin.

    ``PipelineConfig()``'s own field defaults stay platform-independent
    ("jnp", float32) so a bare dataclass never depends on runtime state;
    this helper is where platform awareness lives, and ``zoo.load`` uses
    it when no cfg is given. Before r3 zoo.load defaulted to the bare
    ``PipelineConfig()``, so ``zoo.load("scene")`` on a TPU silently
    built the jnp debug path — measured 76 ms/frame at 720p vs 1.1 ms
    for the identical net at the pallas operating point, a 70x cliff a
    user had no reason to expect from a loader that also applies the
    pallas-calibrated policy files.
    """
    import jax

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    return PipelineConfig(
        tile=TileConfig(tile_h=8, tile_w=8, capacity_fraction=0.375),
        backend="pallas" if on_tpu else "jnp",
        compute_dtype="bfloat16" if on_tpu else "float32",
        cache_dtype="bfloat16" if on_tpu else "float32")


@dataclasses.dataclass(frozen=True)
class _Entry:
    kind: str                 # "sequential" | "graph"
    width: int
    metric: str               # "miou" | "pck"
    npz: str
    tau_json: str
    policy_json: str
    model_kwargs: Dict[str, Any]


REGISTRY: Dict[str, _Entry] = {
    "scene": _Entry("sequential", 128, "miou",
                    f"{_CK}/scene_w128.npz", f"{_CK}/scene_w128_tau.json",
                    f"{_REPO}/POLICY_scene.json",
                    {"num_classes": 8}),
    "scene_hard": _Entry("sequential", 128, "miou",
                         f"{_CK}/scene_w128_hard.npz",
                         f"{_CK}/scene_w128_hard_tau.json",
                         f"{_REPO}/POLICY_scene_hard.json",
                         {"num_classes": 8}),
    "seg": _Entry("sequential", 64, "miou",
                  f"{_CK}/seg_w64.npz", f"{_CK}/seg_w64_tau.json",
                  f"{_REPO}/POLICY_seg.json",
                  {"num_classes": 8}),
    "pose": _Entry("sequential", 64, "pck",
                   f"{_CK}/pose_w64.npz", f"{_CK}/pose_w64_tau.json",
                   f"{_REPO}/POLICY_pose.json", {}),
    "pose_graph": _Entry("graph", 64, "pck",
                         f"{_CK}/pose_graph_w64.npz",
                         f"{_CK}/pose_graph_w64_tau.json",
                         f"{_REPO}/POLICY_pose_graph.json", {}),
}


@dataclasses.dataclass
class Workload:
    name: str
    kind: str                      # "sequential" | "graph"
    net: Any                       # CBNet | CBGraphNet (flagship policy)
    specs: Any                     # layer specs (sequential) | nodes (graph)
    params: Any
    taus: List[float]
    refresh_every: Optional[int]
    metric: str                    # "miou" | "pck"
    # provenance (bench.py contract: a random-weights or default-tau run
    # must be visible, never silent)
    weights: str
    tau_source: str
    policy_source: str
    warnings: List[str]
    # scale of a stripped trailing upsample (see ``load``), else None;
    # callers reproduce it as argmax-then-upsample of the class map
    # (provably identical for nearest upsample)
    upsample_scale: Optional[Tuple[int, int]] = None
    # whether the fused consumer-detect kernel was applied (a throughput-
    # only policy decision — bit-identical either way); independent
    # provenance so a policy fallback can't misreport it (advisor r3)
    fuse_detect: bool = False


def names() -> List[str]:
    return list(REGISTRY)


def load_refresh_cadence(name: str, t: int, h: int, w: int,
                         default: int = 2) -> Tuple[int, str]:
    """Validated refresh cadence for a workload, parity-guarded.

    ``REFRESH_{name}.json`` (written by scripts/validate_refresh.py on
    TPU) records the largest refresh cadence — prolog every R-th T-frame
    chunk — whose WORST-chunk ground-truth degradation stayed within the
    budget over a long horizon. Drift per chunk scales with frames/chunk
    and sprite scale, so a cadence validated at 720p/T=12 says nothing
    about 360p/T=16: the json applies only when the caller's chunk size
    and resolution match what was measured; otherwise the conservative
    default (every 2nd chunk) is returned with the mismatch recorded in
    the source string. Returns ``(cadence_in_chunks, source)``.
    Single consumer-side implementation for bench.py / eval_headline.py /
    bench_pose_graph.py (divergent copies produced a T/resolution parity
    gap, review r3)."""
    path = f"{_REPO}/REFRESH_{name}.json"
    if not os.path.exists(path):
        return default, "default"
    try:
        with open(path) as f:
            rj = json.load(f)
        cad = rj.get("refresh_every_chunks")
        if not cad:
            return default, f"default ({path}: no cadence validated)"
        if rj.get("T") != t or rj.get("shape") != [h, w]:
            return default, (
                f"default ({path} measured at T={rj.get('T')} "
                f"shape={rj.get('shape')}; caller runs T={t} {h}x{w})")
        return int(cad), path
    except Exception as exc:  # stale/corrupt json must not kill a bench
        return default, f"default (unreadable {path}: {exc})"


def load(name: str, in_shape: Tuple[int, int, int] = (720, 1280, 3),
         cfg: Optional[PipelineConfig] = None,
         tau: Optional[float] = None,
         apply_policy: bool = True,
         strip_trailing_upsample: bool = True,
         seed: int = 0) -> Workload:
    """Build the flagship-converted network for a registered workload with
    its trained weights, tuned thresholds, and measured backend policy.

    ``tau`` overrides the tuned vector with a flat value. With
    ``strip_trailing_upsample`` (default), a trailing nearest
    ``UpsampleSpec`` is removed and recorded as ``upsample_scale`` — it is
    argmax-transparent and XLA lane-pads the full-res logits stack 16x
    (eval_headline.py note); callers that need full-res output upsample
    the uint8 class map instead.
    """
    import jax

    if name not in REGISTRY:
        raise KeyError(f"unknown workload {name!r} (have: {names()})")
    e = REGISTRY[name]
    cfg = cfg or default_pipeline_config()
    warnings: List[str] = []
    policy_src, extra, fuse = "none", None, False
    if apply_policy and os.path.exists(e.policy_json):
        with open(e.policy_json) as f:
            pj = json.load(f)
        pol = pj.get("overrides") or {}
        # measured per-workload adoption of the fused consumer-detect
        # kernel (bit-identical to the unfused pair — kernel/network
        # parity suites — so the policy key carries only a THROUGHPUT
        # decision, same-process interleaved A/B in EXP_fused_ab.json)
        fuse = bool(pj.get("fuse_detect", False))
        if pol or fuse:
            policy_src = e.policy_json
            extra = (None if not pol
                     else {int(k): v for k, v in pol.items()}
                     if e.kind == "sequential" else dict(pol))

    def _with_policy_fallback(build):
        """A stale policy file (wrong node names / layer indexes after an
        architecture change) degrades to a no-policy build with a warning
        — the same loudly-but-gracefully contract as weights/taus. The
        fuse_detect decision comes from the SAME policy file, so it is
        dropped together with the overrides: provenance 'none' must mean
        no part of the policy was applied (advisor r3)."""
        nonlocal policy_src, extra, fuse
        try:
            return build(extra, fuse)
        except ValueError as exc:
            if extra is None:
                raise
            warnings.append(f"backend policy NOT applied ({exc})")
            policy_src, extra, fuse = "none", None, False
            return build(None, False)

    if e.kind == "graph":
        from .checkpoint import load_npz_graph_params
        from .graph import convert_graph_flagship, init_graph_params
        from .models.pose import pose_graph
        nodes, out_name = pose_graph(width=e.width, **e.model_kwargs)
        net = _with_policy_fallback(lambda x, fz: convert_graph_flagship(
            nodes, in_shape, cfg, output=out_name, extra_overrides=x,
            fuse_detect=fz))
        params = init_graph_params(nodes, in_shape,
                                   jax.random.PRNGKey(seed))
        weights = f"random(PRNGKey {seed})"
        try:
            params = load_npz_graph_params(e.npz, params)
            weights = "trained(npz)"
        except Exception as exc:
            warnings.append(f"no trained weights ({exc})")
        specs = nodes
        n_cb = net.num_cb_layers()
        up_scale = None
    else:
        from .checkpoint import load_npz_params
        from .convert import convert_flagship, num_cb_layers
        from .models import get_model
        base = name[:-5] if name.endswith("_hard") else name
        specs = get_model(base, width=e.width, **e.model_kwargs)
        up_scale = None
        if strip_trailing_upsample and isinstance(specs[-1], UpsampleSpec):
            up_scale = specs[-1].scale
            specs = specs[:-1]
        net = _with_policy_fallback(lambda x, fz: convert_flagship(
            specs, in_shape, cfg, extra_overrides=x, fuse_detect=fz))
        params = init_params_seq(specs, in_shape, seed)
        weights = f"random(PRNGKey {seed})"
        try:
            params = load_npz_params(e.npz, params)
            weights = "trained(npz)"
        except Exception as exc:
            warnings.append(f"no trained weights ({exc})")
        n_cb = num_cb_layers(net.specs)

    refresh = None
    if tau is not None:
        taus, tau_src = [float(tau)] * n_cb, f"fixed({tau})"
    else:
        d = None
        try:
            with open(e.tau_json) as f:
                d = json.load(f)
        except Exception as exc:
            warnings.append(f"no tuned thresholds ({exc}); tau=0.04")
            taus, tau_src = [0.04] * n_cb, "fixed(0.04)"
        if d is not None:
            # a PRESENT tau file that no longer matches the architecture
            # is a hard error, not a silent flat-tau fallback: publishing
            # rows benchmarked at uncalibrated taus would be worse than
            # crashing
            taus = [float(t) for t in d["thresholds"]]
            if len(taus) != n_cb:
                raise ValueError(
                    f"{e.tau_json}: {len(taus)} thresholds for {n_cb} CB "
                    "layers (stale tau file after an architecture "
                    "change? re-run scripts/tune_model.py)")
            refresh = d.get("metadata", {}).get("refresh_every")
            tau_src = "tuned"

    return Workload(name=name, kind=e.kind, net=net, specs=specs,
                    params=params, taus=taus, refresh_every=refresh,
                    metric=e.metric, weights=weights, tau_source=tau_src,
                    policy_source=policy_src, warnings=warnings,
                    upsample_scale=up_scale, fuse_detect=fuse)


def init_params_seq(specs: Sequence, in_shape, seed: int):
    import jax
    from .network import init_params
    return init_params(specs, in_shape, jax.random.PRNGKey(seed))
