"""Network converter: dense model -> change-based model (SURVEY.md C10).

The reference walks a pretrained PyTorch net and swaps Conv2d/MaxPool2d
(+fused ReLU) modules for stateful CB equivalents, keeping the weights
([repo-recall]; BASELINE.json: "pretrained ... CNN ... converted unchanged").
Here the converter operates on the layer-spec IR: it binds per-layer
thresholds and tile configs and yields a ``CBNet`` — pure ``init_state`` /
``apply`` functions over explicit pytrees, drop-in alongside the dense path
which shares the identical params.

Also provides the torch ``state_dict`` importer so pretrained torch CNNs
(NCHW, OIHW weights) can be converted unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import layers as L
from . import network
from .config import ConvSpec, PipelineConfig, PoolSpec, UpsampleSpec


def dense_conv_on_feature(x, p, spec: ConvSpec, compute_dtype):
    """Dense conv of a layer-output ``x`` that may be a padded Feature.

    POINTWISE convs (1x1, stride 1, no dilation) run straight on the
    PADDED storage and crop the small output instead: a 1x1 output pixel
    depends only on its own input pixel, so cropping commutes, and the
    weights' cin rows are zero-padded to the stored lane width so pad
    lanes contribute nothing. This removes the materialized interior
    crop feeding the flagship dense classifier — a full HBM round trip
    of the producer's map per frame for a consumer that is pointwise
    (xprof r3-final: 40 us/frame of the 720p scene's ~0.46 ms compute,
    the 2nd-largest op after the stem detect). Everything else crops
    first (a k>1 window at the bottom edge would read pad-row garbage).
    """
    w, b = p
    if (isinstance(x, L.Feature) and spec.kernel == (1, 1)
            and spec.stride == (1, 1) and spec.dilation == (1, 1)):
        cin_pad = x.data.shape[-1]
        if w.shape[2] < cin_pad:
            w = jnp.pad(w, ((0, 0), (0, 0), (0, cin_pad - w.shape[2]),
                            (0, 0)))
        # matmul form on the padded storage (r4 adoption, see
        # network.POINTWISE_DOT): kills the lax.conv input layout copy
        conv = (network.pointwise_dot_conv if network.POINTWISE_DOT
                else network.dense_conv)
        y = conv(x.data, w, b, spec, compute_dtype)
        return y[:x.h, :x.w]
    x = x.crop() if isinstance(x, L.Feature) else x
    return network.dense_conv(x, w, b, spec, compute_dtype)


@dataclasses.dataclass(frozen=True)
class CBNet:
    """A converted change-based network (functional; state passed explicitly).

    Usage:
        net = convert(specs, in_shape, cfg, thresholds=tau_vec)
        state = net.init_state()
        step = jax.jit(net.apply, donate_argnums=1)
        for frame in video:
            y, state, stats = step(params, state, frame)
    """

    specs: Tuple[Any, ...]
    in_shape: Tuple[int, int, int]
    cfg: PipelineConfig

    def init_state(self) -> List[Optional[L.CBLayerState]]:
        states: List[Optional[L.CBLayerState]] = []
        shape = self.in_shape
        for spec, out_shape in zip(self.specs,
                                   network.out_shapes(self.specs, self.in_shape)):
            is_cb = isinstance(spec, (ConvSpec, PoolSpec)) and spec.use_cb
            states.append(L.cb_layer_init(spec, shape, self.cfg) if is_cb
                          else None)
            shape = out_shape
        return states

    def apply(self, params: Sequence, state: Sequence, x: jnp.ndarray,
              thresholds: Optional[jnp.ndarray] = None
              ) -> Tuple[jnp.ndarray, List, List[Dict[str, Any]]]:
        """One frame through the CB network. Returns (y, state', stats).

        ``thresholds``: optional (num_cb_layers,) array of runtime tau values
        overriding the specs' static thresholds — used by the tuner so one
        compiled graph serves every point of the sweep.
        """
        new_state: List = []
        stats: List[Dict[str, Any]] = []
        cb_i = 0
        hint = None  # dirty hint chained between CB layers (layers.py doc)

        def as_array(v):
            return v.crop() if isinstance(v, L.Feature) else v

        for k, (spec, p, st) in enumerate(zip(self.specs, params, state)):
            tau = None
            if (thresholds is not None
                    and isinstance(spec, (ConvSpec, PoolSpec)) and spec.use_cb):
                tau = thresholds[cb_i]
                cb_i += 1
            # named scope -> xprof/HLO op_name carries the layer identity
            # (profile_trace.py joins trace ops against it)
            scope = f"L{k}_{spec.kind}" + (
                f"_{spec.backend}" if getattr(spec, "backend", None) else "")
            with jax.named_scope(scope):
                if isinstance(spec, ConvSpec):
                    if spec.use_cb:
                        fuse_ctx = None
                        if spec.fuse_next_detect and k + 1 < len(self.specs):
                            # hand the producer its consumer's cache + tau;
                            # the consumer's detect is then served by
                            # hint.predetect (layers._detect_and_mask)
                            s2 = self.specs[k + 1]
                            if (isinstance(s2, ConvSpec) and s2.use_cb
                                    and not s2.forward_hint
                                    and state[k + 1] is not None):
                                tau2 = (thresholds[cb_i]
                                        if thresholds is not None else None)
                                fuse_ctx = L.FuseCtx(
                                    spec=s2,
                                    in_cache=state[k + 1].in_cache,
                                    tau=tau2)
                        x, st, s, hint = L.cb_conv_apply(
                            p, st, x, spec, self.cfg, tau, hint,
                            fuse_ctx=fuse_ctx)
                    else:
                        x = dense_conv_on_feature(
                            x, p, spec, jnp.dtype(self.cfg.compute_dtype))
                        s, hint = {}, None
                elif isinstance(spec, PoolSpec):
                    if spec.use_cb:
                        x, st, s, hint = L.cb_pool_apply(st, x, spec,
                                                         self.cfg, tau, hint)
                    else:
                        x = network.dense_pool(as_array(x), spec)
                        s, hint = {}, None
                elif isinstance(spec, UpsampleSpec):
                    x = network.upsample(as_array(x), spec)
                    s, hint = {}, None
                else:
                    raise TypeError(spec)
            new_state.append(st)
            stats.append(s)
        return as_array(x), new_state, stats

    def apply_dense(self, params: Sequence, x: jnp.ndarray) -> jnp.ndarray:
        return network.dense_apply(self.specs, params, x, self.cfg)

    def apply_refresh(self, params: Sequence, state: Sequence,
                      x: jnp.ndarray,
                      thresholds: Optional[jnp.ndarray] = None):
        """Full-refresh frame: accept everything, recompute everything at
        DENSE-path speed (layers.cb_conv_refresh). Same signature/pytree
        structure as ``apply`` so the two can sit in one lax.cond
        (runner.scan_video refresh_every). ``thresholds`` is ignored —
        a refresh is tau = -infinity by definition."""
        del thresholds
        new_state: List = []
        stats: List[Dict[str, Any]] = []

        def as_array(v):
            return v.crop() if isinstance(v, L.Feature) else v

        for spec, p, st in zip(self.specs, params, state):
            if isinstance(spec, ConvSpec):
                if spec.use_cb:
                    x, st, s, _ = L.cb_conv_refresh(p, st, x, spec, self.cfg)
                else:
                    x = dense_conv_on_feature(
                        x, p, spec, jnp.dtype(self.cfg.compute_dtype))
                    s = {}
            elif isinstance(spec, PoolSpec):
                if spec.use_cb:
                    x, st, s, _ = L.cb_pool_refresh(st, x, spec, self.cfg)
                else:
                    x = network.dense_pool(as_array(x), spec)
                    s = {}
            elif isinstance(spec, UpsampleSpec):
                x = network.upsample(as_array(x), spec)
                s = {}
            else:
                raise TypeError(spec)
            new_state.append(st)
            stats.append(s)
        return as_array(x), new_state, stats

    def make_ingest(self, frames: jnp.ndarray):
        """Clip-resident ingest (runner.scan_video ``ingest=True``).

        When the first layer is a fused-detect patch_stem conv, convert
        the whole (T, H, W, C) chunk to flat4 ONCE (one vectorized XLA
        pass) and return ``wrap(t) -> Flat4Clip`` so the scan body hands
        the stem a frame INDEX instead of a sliced frame — the detect
        kernel then DMAs its bands straight out of HBM (xprof r3: the
        per-frame dynamic_slice + to_flat4 pad/reshape chain cost ~90 us
        of the 658 us 720p scene frame). Returns None when the net's
        stem cannot consume the form (runner falls back to the classic
        per-frame xs slicing).
        """
        from .ops import flat4 as flat4_ops
        s0 = self.specs[0] if self.specs else None
        if not (isinstance(s0, ConvSpec) and s0.use_cb
                and (s0.backend or self.cfg.backend) == "patch_stem"):
            return None
        if not (self.cfg.tile.tile_h == L.HINT_TILE
                and self.cfg.tile.tile_w == L.HINT_TILE):
            return None  # fused-detect gate (layers.cb_conv_apply)
        H, W, C = self.in_shape
        if frames.shape[1:] != (H, W, C) or not flat4_ops.supports(
                (H, W, C), s0.kernel, s0.stride, s0.dilation, s0.padding,
                s0.activation):
            return None
        fg = flat4_ops.flat4_geom(H, W, C)
        clip = flat4_ops.clip_to_flat4(frames, fg)
        return lambda t: flat4_ops.Flat4Clip(
            clip=clip, t=jnp.asarray(t, jnp.int32), h=H, w=W, cin=C)


def convert(specs: Sequence, in_shape: Tuple[int, int, int],
            cfg: Optional[PipelineConfig] = None,
            thresholds: Optional[Sequence[float]] = None,
            dense_layers: Sequence[int] = (),
            backend_overrides: Optional[Dict[int, str]] = None) -> CBNet:
    """Convert a dense layer-spec chain into a change-based network.

    Args:
      specs: LayerSpec sequence (the dense model definition).
      in_shape: (H, W, C) of the input frames.
      cfg: pipeline config (tiles, dtypes, backend).
      thresholds: optional per-CB-layer tau vector overriding spec thresholds
        (one entry per conv/pool layer, in order) — the tuner's output.
      dense_layers: indices (into specs) forced to run densely every frame
        (the papers leave cheap layers dense when caching isn't worth it).
    """
    cfg = cfg or PipelineConfig()
    if thresholds is not None:
        n_cb = num_cb_layers(specs)
        if len(thresholds) != n_cb:
            raise ValueError(
                f"got {len(thresholds)} thresholds for {n_cb} CB layers")
    new_specs = []
    ti = 0
    for i, spec in enumerate(specs):
        if isinstance(spec, (ConvSpec, PoolSpec)):
            changes: Dict[str, Any] = {}
            if thresholds is not None and spec.use_cb:
                changes["threshold"] = float(thresholds[ti])
                ti += 1
            if i in dense_layers:
                changes["use_cb"] = False
            if backend_overrides and i in backend_overrides:
                changes["backend"] = backend_overrides[i]
            spec = dataclasses.replace(spec, **changes) if changes else spec
        new_specs.append(spec)
    return CBNet(specs=tuple(new_specs), in_shape=tuple(in_shape), cfg=cfg)


def num_cb_layers(specs: Sequence) -> int:
    return sum(1 for s in specs
               if isinstance(s, (ConvSpec, PoolSpec)) and s.use_cb)


def flagship_layers(specs: Sequence,
                    in_shape: Optional[Tuple[int, int, int]] = None,
                    cfg: Optional[PipelineConfig] = None):
    """(backend_overrides, dense_layers) of the SHIPPED configuration.

    Measured policies (RESULTS.md optimization ledger), applied to every
    model family so bench.py / tuners / tests build the identical network:

    * a SMALL-cin stem (cin < 128, i.e. below one TPU lane) runs
      ``patch_stem`` on pallas pipelines when the flat4 gate holds
      (3x3/s1/SAME, cin<=3, 8/32-divisible dims): the fused-assembly
      sparse kernel on the lane-aligned flat4 cache, bit-identical to the
      dense conv but recomputing only dirty tiles (ops/pallas/patch_stem
      doc). Otherwise ``dense_cached``: detect on the cheap few-channel
      input + dense conv from the accepted cache, emitting the dirty-hint
      chain. No Pallas delta kernel can serve small-lane HWC inputs on
      this hardware (Mosaic lane-pads small-lane buffers 43x and rejects
      their DMA slicing), and
      a hint-less stem poisons every downstream detect. On a pallas
      PIPELINE the stem writes its output LANE-padded via padded weights
      so the consumer's pad_lanes is a no-op (a 0.70 ms/frame pad at 720p,
      xprof r3; layers.cb_layer_init). In-scan probes (r3) pinned the
      stem formulation: HWC detect 0.06 ms + im2col conv ~1.1 ms beats
      every planar/flat/strided-conv alternative (flat-view reshape
      7.9 ms, planar transpose +0.56 ms, NCHW strided flat conv 3.4 ms,
      hand Pallas 1.6 ms) — ``dense_cached_flat`` remains available as a
      documented negative result. The override is gated on the actual
      stem cin when ``in_shape`` is given (a wide imported-feature input
      keeps the sparse stem path; ADVICE r2); without ``in_shape`` the
      historical cin=3 assumption applies.
    * the trailing 1x1 classifier runs plain dense: nothing downstream
      consumes its hint, and CB bookkeeping (detect + compact + scatter)
      on a 1x1 conv costs more than recomputing it (measured: dense 1x1
      classifier saved ~0.1 ms/frame at 720p).
    """
    from .layers import LANE
    from .ops import flat4 as flat4_ops
    small_stem = in_shape is None or in_shape[2] < LANE
    overrides = {}
    if isinstance(specs[0], ConvSpec) and small_stem:
        # On a pallas pipeline a 3x3/s1/SAME small-cin stem runs the
        # fused-assembly SPARSE kernel on the lane-aligned flat4 cache
        # (ops/pallas/patch_stem.py): bit-identical output to the
        # dense_cached conv but only dirty (8,32) tiles recomputed —
        # 0.13 vs 0.63 ms/frame at the measured ~5% 720p scene stem
        # density. Shapes/kernels outside the flat4 gate (and non-pallas
        # pipelines, incl. the CPU dryrun) keep dense_cached.
        s0 = specs[0]
        if (cfg is not None and cfg.backend == "pallas"
                and in_shape is not None
                and flat4_ops.supports(in_shape, s0.kernel, s0.stride,
                                       s0.dilation, s0.padding,
                                       s0.activation)):
            overrides = {0: "patch_stem"}
        else:
            overrides = {0: "dense_cached"}
    dense = []
    i = len(specs) - 1
    while i > 0 and isinstance(specs[i], UpsampleSpec):
        i -= 1
    if i > 0 and isinstance(specs[i], ConvSpec) \
            and specs[i].kernel == (1, 1):
        dense.append(i)
    return overrides, dense


def convert_flagship(specs: Sequence, in_shape: Tuple[int, int, int],
                     cfg: Optional[PipelineConfig] = None,
                     thresholds: Optional[Sequence[float]] = None,
                     extra_overrides: Optional[Dict[int, str]] = None,
                     fuse_detect: bool = False) -> CBNet:
    """Convert with the shipped layer policy (see flagship_layers).

    ``thresholds`` is sized by the CONVERTED network's CB-layer count
    (num_cb_layers(net.specs)) — the dense classifier consumes no tau.
    ``extra_overrides`` layers additional per-spec-index backend choices
    on top of the flagship policy (extra wins on conflicts) — the hook the
    measured per-layer policy optimizer (scripts/optimize_policy.py) uses
    to flip bookkeeping-bound layers to dense_cached. The special value
    ``"forward_hint"`` sets the spec's CB17 mask-forwarding mode instead
    of a backend: the layer skips detection and recomputes its producer's
    hint region unconditionally (value-exact superset; the layer's tau
    slot stays in the vector but is dead — tuner.dead-tau precedent).

    ``fuse_detect=True`` additionally marks plain-pallas conv→conv chains
    for the fused consumer-detect kernel (ConvSpec.fuse_next_detect).
    OPT-IN, default off — bit-identical either way; the adoption decision
    follows the same-process interleaved A/B (EXP_fused_ab.json).
    """
    cfg = cfg or PipelineConfig()  # the elide pass below reads cfg fields
    overrides, dense = flagship_layers(specs, in_shape, cfg)
    fwd_hint_keys = ()
    if extra_overrides:
        bad = [k for k in extra_overrides if not 0 <= k < len(specs)]
        if bad:
            raise ValueError(
                f"extra_overrides: layer index(es) {bad} out of range for "
                f"{len(specs)} specs (stale POLICY file measured on an "
                "older architecture?)")
        fwd_hint_keys = tuple(k for k, v in extra_overrides.items()
                              if v == "forward_hint")
        overrides = {**overrides,
                     **{k: v for k, v in extra_overrides.items()
                        if v != "forward_hint"}}
    if fwd_hint_keys:
        specs = tuple(
            dataclasses.replace(s, forward_hint=True)
            if i in fwd_hint_keys else s
            for i, s in enumerate(specs))
    net = convert(specs, in_shape, cfg, dense_layers=dense,
                  backend_overrides=overrides)
    # aligned pools run hint-forwarded (one fused kernel, no detection /
    # input-cache traffic; see PoolSpec.forward_hint) — they keep their
    # tau slot for tau-vector compatibility, but the tau is unused.
    # Where the fused gate PROVABLY holds at static shapes and the
    # producer always emits a hint, the pool's never-read input cache is
    # elided to a placeholder (PoolSpec.elide_in_cache — ~hundreds of MB
    # of donated-carry HBM per forward pool at 720p).
    from .layers import _geometry, _layer_cfg, fused_pool_gate, lane_pad
    from .netview import NetView, hint_reaches
    view = NetView.from_specs(net.specs, in_shape, cfg)
    new_specs = []
    for i, s in enumerate(net.specs):
        if isinstance(s, PoolSpec) and s.use_cb and s.window == s.stride:
            s = dataclasses.replace(s, forward_hint=True)
            lcfg = _layer_cfg(s, cfg)
            h, w, c = view.rows[i].in_shape
            cpad = lane_pad(c, lcfg)
            g = _geometry(s, (h, w, cpad), lcfg)
            if fused_pool_gate(s, g, lcfg, cpad) \
                    and hint_reaches(view, i):
                s = dataclasses.replace(s, elide_in_cache=True)
        new_specs.append(s)
    # fused consumer-detect pass (ops/pallas/delta_conv_detect.py): a
    # plain-pallas CB conv whose IMMEDIATE successor is a detecting CB
    # conv runs the fused kernel when the static gate holds — the
    # consumer's detect then costs zero extra HBM reads (its tiles are in
    # VMEM at the producer's scatter). Bit-identical either way, so tuned
    # tau files stay valid. Opt-in (measured 0.99×; fuse_detect doc).
    for i in range(len(new_specs) - 1 if fuse_detect else 0):
        if L.fuse_next_gate(new_specs[i], new_specs[i + 1],
                            view.rows[i].in_shape, cfg):
            new_specs[i] = dataclasses.replace(new_specs[i],
                                               fuse_next_detect=True)
    net = dataclasses.replace(net, specs=tuple(new_specs))
    if thresholds is not None:
        net = convert(net.specs, in_shape, cfg, thresholds=thresholds)
    return net


# ------------------------- torch module auto-walker -------------------------


def specs_from_torch(module, fuse_relu: bool = True):
    """Walk a sequentially-executing torch module tree and emit (specs,
    params) in one call — the reference converter's actual workflow
    (SURVEY.md C10, §3.1: walk a pretrained ``nn.Sequential`` and swap
    modules), so no hand-written spec twin is needed (VERDICT r2 #4).

    Supported leaves: ``Conv2d`` (groups=1; zero padding -> VALID,
    symmetric half padding with odd kernels -> SAME), ``ReLU`` (fused into
    the preceding conv), ``BatchNorm2d`` (FOLDED into the preceding conv's
    weights/bias at inference semantics: w' = w * g/sqrt(var+eps),
    b' = (b - mean) * g/sqrt(var+eps) + beta — exact, conv-bn[-relu]
    chains convert with zero runtime cost), ``MaxPool2d`` (padding 0,
    dilation 1), ``Upsample`` (nearest/bilinear, integer scale), and
    no-ops (``Identity``/``Dropout*``/``Flatten`` at the tail). Containers
    (``Sequential``, ``ModuleList``, custom modules with children) are
    recursed in child order — correct exactly when the module executes its
    children sequentially, which is the same contract the reference's
    converter assumes. Anything else raises with the offending qualified
    name.

    Returns (specs, params) where params aligns with specs
    (import_torch_state_dict underneath).
    """
    import torch.nn as nn

    def pair(v):
        return (v, v) if isinstance(v, int) else (int(v[0]), int(v[1]))

    specs: List = []
    prefixes: List[str] = []
    bn_folds: List = []  # (spec index, bn qualified name, eps)
    flatten_at: List[str] = []  # a Flatten is only a no-op at the TAIL

    def leaf(name: str, m):
        if flatten_at and not isinstance(
                m, (nn.Identity, nn.Dropout, nn.Dropout2d, nn.Flatten)):
            raise TypeError(
                f"{name}: spatial module after Flatten "
                f"({flatten_at[0]}) — Flatten is only supported as a "
                "trailing no-op (the layer IR is spatial throughout)")
        if isinstance(m, nn.Conv2d):
            if m.groups != 1:
                raise ValueError(f"{name}: grouped conv unsupported")
            kh, kw = pair(m.kernel_size)
            dh, dw = pair(m.dilation)
            sh, sw = pair(m.stride)
            if m.padding == "same":
                padding = "SAME"
            elif m.padding == "valid":
                padding = "VALID"
            else:
                ph, pw = pair(m.padding)
                if (ph, pw) == (0, 0):
                    padding = "VALID"
                elif ((ph, pw) == (dh * (kh - 1) // 2, dw * (kw - 1) // 2)
                      and kh % 2 and kw % 2 and (sh, sw) == (1, 1)):
                    # stride-1 half padding: torch symmetric == XLA SAME
                    padding = "SAME"
                else:
                    # torch symmetric padding placement differs from XLA
                    # SAME under stride > 1 — keep it explicit
                    # (config._as_padding / ops/geometry.conv_pads)
                    padding = (ph, pw)
            specs.append(ConvSpec(
                features=m.out_channels, kernel=(kh, kw),
                stride=pair(m.stride), dilation=(dh, dw), padding=padding,
                activation=None, use_bias=m.bias is not None))
            prefixes.append(name)
        elif isinstance(m, nn.BatchNorm2d):
            if not (specs and isinstance(specs[-1], ConvSpec)
                    and specs[-1].activation is None):
                raise ValueError(f"{name}: BatchNorm2d without a preceding "
                                 "(activation-free) conv to fold into")
            if m.running_mean is None or m.running_var is None:
                raise ValueError(f"{name}: track_running_stats=False — no "
                                 "stats to fold at inference")
            # folded bias is (b - mean)*scale + beta: nonzero even for
            # bias-free convs, so the spec grows a bias slot
            if not specs[-1].use_bias:
                specs[-1] = dataclasses.replace(specs[-1], use_bias=True)
            bn_folds.append((len(specs) - 1, name, float(m.eps)))
        elif isinstance(m, nn.ReLU):
            if (fuse_relu and specs and isinstance(specs[-1], ConvSpec)
                    and specs[-1].activation is None):
                specs[-1] = dataclasses.replace(specs[-1],
                                                activation="relu")
            else:
                raise ValueError(f"{name}: standalone ReLU (no preceding "
                                 "conv to fuse into)")
        elif isinstance(m, nn.MaxPool2d):
            if pair(m.padding) != (0, 0) or pair(m.dilation) != (1, 1) \
                    or m.ceil_mode:
                raise ValueError(f"{name}: only padding=0, dilation=1, "
                                 "ceil_mode=False MaxPool2d supported")
            window = pair(m.kernel_size)
            specs.append(PoolSpec(
                window=window,
                stride=pair(m.stride) if m.stride is not None else window,
                padding="VALID"))
        elif isinstance(m, nn.Upsample):
            if m.mode not in ("nearest", "bilinear"):
                raise ValueError(f"{name}: Upsample mode {m.mode}")
            if m.scale_factor is None:
                raise ValueError(f"{name}: Upsample needs scale_factor")
            sf = m.scale_factor
            sh, sw = (sf, sf) if not isinstance(sf, (tuple, list)) else sf
            if int(sh) != sh or int(sw) != sw:
                raise ValueError(f"{name}: non-integer scale {sf}")
            specs.append(UpsampleSpec(scale=(int(sh), int(sw)),
                                      method=m.mode))
        elif isinstance(m, nn.Flatten):
            flatten_at.append(name)  # no-op ONLY if nothing spatial follows
        elif isinstance(m, (nn.Identity, nn.Dropout, nn.Dropout2d)):
            pass  # inference no-ops
        else:
            raise TypeError(f"{name}: unsupported module {type(m).__name__}")

    def walk(prefix: str, m):
        kids = list(m.named_children())
        if not kids:
            leaf(prefix or type(m).__name__, m)
            return
        for kname, k in kids:
            walk(f"{prefix}.{kname}" if prefix else kname, k)

    walk("", module)
    sd = module.state_dict()
    params = import_torch_state_dict(specs, sd, conv_prefixes=prefixes)

    if bn_folds:
        import numpy as np

        def to_np(t):
            return np.asarray(t.detach().cpu().numpy()
                              if hasattr(t, "detach") else t)

        for si, bn, eps in bn_folds:
            mean = to_np(sd[f"{bn}.running_mean"]).astype(np.float64)
            var = to_np(sd[f"{bn}.running_var"]).astype(np.float64)
            # affine=False stores no weight/bias keys: gamma=1, beta=0
            g = (to_np(sd[f"{bn}.weight"]).astype(np.float64)
                 if f"{bn}.weight" in sd else np.ones_like(mean))
            beta = (to_np(sd[f"{bn}.bias"]).astype(np.float64)
                    if f"{bn}.bias" in sd else np.zeros_like(mean))
            scale = g / np.sqrt(var + eps)
            w, b = params[si]
            b0 = np.zeros_like(mean) if b is None \
                else np.asarray(b, np.float64)
            params[si] = (
                jnp.asarray(np.asarray(w, np.float64) * scale,
                            jnp.asarray(w).dtype),
                jnp.asarray((b0 - mean) * scale + beta, jnp.float32))
    return specs, params


# ------------------------- torch state_dict import --------------------------


def import_torch_state_dict(specs: Sequence, state_dict: Dict[str, Any],
                            conv_prefixes: Optional[Sequence[str]] = None
                            ) -> List:
    """Map a torch ``state_dict`` (OIHW conv weights) onto the spec chain.

    Conv layers consume weight/bias pairs in order of their appearance in
    ``state_dict`` (or explicitly via ``conv_prefixes``, e.g.
    ``["features.0", "features.3"]``). Returns a params list aligned with
    ``specs``. torch is imported lazily (CPU build available in this env).
    """
    import numpy as np

    def to_np(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                          else t)

    if conv_prefixes is None:
        conv_prefixes = []
        for k in state_dict:
            if k.endswith(".weight") and to_np(state_dict[k]).ndim == 4:
                conv_prefixes.append(k[: -len(".weight")])

    params: List = []
    it = iter(conv_prefixes)
    for spec in specs:
        if isinstance(spec, ConvSpec):
            prefix = next(it)
            w = to_np(state_dict[f"{prefix}.weight"])  # OIHW
            if w.shape[2:] != tuple(spec.kernel) or w.shape[0] != spec.features:
                raise ValueError(
                    f"{prefix}: torch weight {w.shape} does not match spec "
                    f"{spec}")
            w = jnp.asarray(w.transpose(2, 3, 1, 0))   # OIHW -> HWIO
            b_key = f"{prefix}.bias"
            b = (jnp.asarray(to_np(state_dict[b_key]))
                 if spec.use_bias and b_key in state_dict else None)
            params.append((w, b))
        else:
            params.append(None)
    return params
