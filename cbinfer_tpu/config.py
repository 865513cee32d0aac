"""Typed configuration system (SURVEY.md C19).

The reference (lukasc-ch/CBinfer; /root/reference is empty this session — see
SURVEY.md §0) used argparse flags and in-script constants; the only load-bearing
configuration there is the per-layer change threshold tau and the model choice.
Here every knob is an explicit, JSON-round-trippable dataclass so benchmark
outputs can be reproduced from their saved config.

Conventions used throughout the framework:
  * Single-frame feature maps are HWC (channels last, lane-dim friendly).
  * Batched/streamed maps are NHWC / (streams, H, W, C).
  * Conv weights are HWIO: (kh, kw, c_in, c_out).
  * Tiles are defined on the OUTPUT grid of each layer: the unit of recompute
    is a (tile_h, tile_w) block of output pixels. Change detection and cache
    updates remain per-pixel (exact reference semantics, SURVEY.md §1 stage 1);
    only the recompute granularity is tiled. See ops/delta_conv.py.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple


def _as_pair(v) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    a, b = v
    return (int(a), int(b))


def _as_padding(v):
    """'SAME' | 'VALID' | int | (ph, pw): explicit values are SYMMETRIC
    per-dim zero padding with torch output semantics
    (floor((n + 2p - keff)/s) + 1) — what specs_from_torch emits for
    strided torch convs, whose symmetric padding placement differs from
    XLA SAME (ops/geometry.conv_pads)."""
    if isinstance(v, str):
        if v not in ("SAME", "VALID"):
            raise ValueError(f"padding must be SAME/VALID/int pair, got {v}")
        return v
    return _as_pair(v)


@dataclass(frozen=True)
class TileConfig:
    """Tile-level block-sparsity parameters (SURVEY.md §7 design stance).

    ``capacity_fraction`` bounds the compacted changed-tile buffer: the static
    buffer holds ``ceil(capacity_fraction * n_tiles)`` tile slots. If more
    tiles change in a frame, the layer falls back to a dense pass for that
    frame (lax.cond), which is recorded in the step stats.
    """

    tile_h: int = 8
    tile_w: int = 8
    capacity_fraction: float = 1.0

    def capacity(self, n_tiles: int) -> int:
        cap = int(-(-self.capacity_fraction * n_tiles // 1))  # ceil
        return max(1, min(cap, n_tiles))


@dataclass(frozen=True)
class ConvSpec:
    """Layer IR node for a (conv [+bias] [+activation]) layer.

    Mirrors the reference's CBConv2d drop-in module (SURVEY.md C9): a conv
    with an optional fused pointwise nonlinearity, gated by threshold tau.
    tau <= 0 with use_cb=True still runs the change-based pipeline (any
    nonzero pixel diff triggers recompute -> exact dense equivalence);
    use_cb=False runs the layer densely every frame (the papers also leave
    cheap layers dense when caching is not worth it).
    """

    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    padding: str = "SAME"  # "SAME" or "VALID"
    activation: Optional[str] = "relu"  # None | "relu"
    use_bias: bool = True
    threshold: float = 0.0
    use_cb: bool = True
    # per-layer kernel backend override (None = inherit PipelineConfig).
    # e.g. the first layer (cin=3) is better served by the XLA tile path:
    # detection on 3 channels is cheap, lane-padding to 128 would inflate
    # its cache 43x, and running it change-based (not dense) is what makes
    # its consumer's detection sparse via the hint chain.
    backend: Optional[str] = None
    # CB17 mask-forwarding fast path (the conv twin of
    # PoolSpec.forward_hint): when the producer emits a dirty hint, skip
    # detection entirely — the changed-tile mask is the hint dilated by
    # this conv's receptive field, and the input cache is refreshed by a
    # pure tile-copy (no diff, no tau; ``threshold`` is unused on this
    # path). Bit-identical to running this layer at tau = -1 through
    # re-detection (layers.py change-mask-modes doc), with ~1/3 less
    # detection traffic and no mask compute. Falls back to re-detection
    # whenever no hint is available (layer 0, after dense layers).
    forward_hint: bool = False
    # Fused consumer-detect (set by convert_flagship where the static
    # fuse gate holds, ops/pallas/delta_conv_detect.fuse_gate): this
    # layer's Pallas delta-conv kernel ALSO runs the NEXT layer's
    # detect+accept+dilate on each output tile while it is still in VMEM,
    # and the consumer skips its detect stage entirely (layers.PreDetect).
    # Bit-identical to the unfused pair; ignored (silent fallback to the
    # plain kernel) whenever the runtime gate does not hold, so the same
    # spec runs correctly on the jnp/CPU twin.
    fuse_next_detect: bool = False
    kind: str = "conv"

    def __post_init__(self):
        object.__setattr__(self, "kernel", _as_pair(self.kernel))
        object.__setattr__(self, "stride", _as_pair(self.stride))
        object.__setattr__(self, "dilation", _as_pair(self.dilation))
        object.__setattr__(self, "padding", _as_padding(self.padding))
        if self.activation not in (None, "relu"):
            raise ValueError(f"unsupported activation {self.activation}")


@dataclass(frozen=True)
class PoolSpec:
    """Layer IR node for change-based max pooling (SURVEY.md C7).

    ``forward_hint=True`` (set by convert_flagship on aligned pools) runs
    the pool in CB17 mask-forwarding mode on the pallas backend: it
    recomputes exactly the producer's dirty-hinted blocks in ONE fused
    kernel (no per-pixel detection, no input cache reads, ``threshold``
    unused) — value-exact w.r.t. the producer's accepted values, a
    conservative superset of what re-detection would recompute. Requires
    window == stride and a producer hint; falls back to re-detection
    otherwise.

    ``elide_in_cache=True`` (set by the flagship converters ONLY when the
    fused gate provably holds at this layer's static shapes AND the
    producer always emits a hint) replaces the layer's input cache with a
    (1, 1, 1) placeholder: the fused path never reads it, and carrying it
    wastes ~hundreds of MB of donated scan-carry HBM at 720p. With this
    flag the re-detection fallback is statically unreachable
    (cb_pool_apply asserts so).
    """

    window: Tuple[int, int] = (2, 2)
    stride: Tuple[int, int] = (2, 2)
    padding: str = "VALID"
    threshold: float = 0.0
    use_cb: bool = True
    backend: Optional[str] = None  # see ConvSpec.backend
    forward_hint: bool = False
    elide_in_cache: bool = False
    kind: str = "pool"

    def __post_init__(self):
        object.__setattr__(self, "window", _as_pair(self.window))
        object.__setattr__(self, "stride", _as_pair(self.stride))
        object.__setattr__(self, "padding", _as_padding(self.padding))


@dataclass(frozen=True)
class UpsampleSpec:
    """Nearest/bilinear upsampling (dense; used by segmentation heads)."""

    scale: Tuple[int, int] = (2, 2)
    method: str = "nearest"  # "nearest" | "bilinear"
    kind: str = "upsample"

    def __post_init__(self):
        object.__setattr__(self, "scale", _as_pair(self.scale))


LayerSpec = Any  # Union[ConvSpec, PoolSpec, UpsampleSpec]


@dataclass(frozen=True)
class PipelineConfig:
    """Whole-pipeline execution parameters (dtypes, tiling, kernel backend)."""

    tile: TileConfig = field(default_factory=TileConfig)
    compute_dtype: str = "float32"   # dtype of conv math
    cache_dtype: str = "float32"     # dtype of persistent HBM activation caches
    backend: str = "jnp"             # "jnp" (XLA ops) | "pallas"
    interpret: bool = False          # Pallas interpreter mode (CPU testing)


@dataclass(frozen=True)
class RunConfig:
    """Top-level run description saved next to benchmark outputs."""

    model: str = "scene"
    height: int = 720
    width: int = 1280
    frames: int = 32
    streams: int = 1
    seed: int = 0
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)


# ------------------------------ JSON round-trip ------------------------------

_SPEC_KINDS = {"conv": ConvSpec, "pool": PoolSpec, "upsample": UpsampleSpec}


def to_json(obj) -> str:
    return json.dumps(_encode(obj), indent=2, sort_keys=True)


def _encode(obj):
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        d = {f.name: _encode(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
        d["__type__"] = type(obj).__name__
        return d
    if isinstance(obj, (list, tuple)):
        return [_encode(v) for v in obj]
    return obj


_TYPES = {
    "TileConfig": TileConfig,
    "ConvSpec": ConvSpec,
    "PoolSpec": PoolSpec,
    "UpsampleSpec": UpsampleSpec,
    "PipelineConfig": PipelineConfig,
    "RunConfig": RunConfig,
}


def from_json(s: str):
    return _decode(json.loads(s))


def _decode(obj):
    if isinstance(obj, dict):
        t = obj.pop("__type__", None)
        decoded = {k: _decode(v) for k, v in obj.items()}
        if t is not None:
            return _TYPES[t](**decoded)
        return decoded
    if isinstance(obj, list):
        return [_decode(v) for v in obj]
    return obj
