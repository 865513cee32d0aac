"""Per-pixel golden reference of the CBinfer algorithm (SURVEY.md C12).

Pure NumPy, CPU-only, exact reference semantics as described in the CBinfer
papers (arXiv 1704.04313 §3; arXiv 1808.05488 §IV — /root/reference is empty
this session, see SURVEY.md §0, so the papers + BASELINE.json are the spec of
record). This module is the correctness oracle for the tiled TPU pipeline.

The five per-layer stages (SURVEY.md §1):
  1. change detection   : pixel p changed  iff  max_c |x[p,c] - in_cache[p,c]| > tau
                          in_cache[p] <- x[p]  ONLY at changed pixels (the
                          comparison baseline is the last ACCEPTED value, so
                          sub-threshold drift accumulates as bounded error
                          instead of triggering recompute)
  2. change propagation : output pixel q must be recomputed iff any input pixel
                          in its receptive field (kernel/stride/dilation
                          geometry) changed
  3. index extraction   : compact changed-output map to index list (implicit
                          here: we use the boolean map directly)
  4. gather (im2col)    : gather input patches at changed outputs
  5. GEMM + update      : y = W.x + b, activation, scatter into out_cache

Key invariant (proved by induction, asserted in tests): after every frame,
``out_cache == conv(in_cache)`` at EVERY pixel, not just recomputed ones —
an output pixel is skipped only when no input in its receptive field was
accepted this frame, in which case its cached value already equals the conv
of the current cache. The approximation error of CBinfer therefore lives
entirely in ``in_cache != x``; masks only decide how much compute is spent.
The tiled TPU pipeline shares the identical per-pixel cache-update rule and a
superset recompute mask, so its results are bit-identical (up to float
reassociation) to this golden model — PROVIDED the golden run uses the same
cache dtype (``cache_dtype="bfloat16"`` for bf16 pipelines; quantize_cache).

All feature maps are HWC float arrays; weights are HWIO (kh, kw, cin, cout).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from .config import ConvSpec, PoolSpec, UpsampleSpec


# --------------------------- dense reference ops ----------------------------


# shared with the pipeline geometry (ops/geometry.py): SAME/VALID plus
# explicit symmetric int padding (torch semantics, config._as_padding)

# Geometry helpers are deliberately REIMPLEMENTED here rather than
# imported from ops/geometry.py: this module is the independent oracle,
# and sharing the pipeline's own padding/size formulas would let a
# geometry regression pass every golden-equivalence test (both sides
# computing the same wrong shapes). tests/test_golden.py cross-checks
# these twins against ops.geometry on a shape sweep.

def pad_dim(padding, axis: int):
    return padding if isinstance(padding, str) else int(padding[axis])


def conv_out_size(n: int, k: int, s: int, d: int, padding) -> int:
    keff = (k - 1) * d + 1
    if padding == "SAME":
        return -(-n // s)
    p = 0 if padding == "VALID" else int(padding)
    return (n + 2 * p - keff) // s + 1


def conv_pads(n: int, k: int, s: int, d: int, padding):
    if padding == "SAME":
        keff = (k - 1) * d + 1
        out = -(-n // s)
        total = max(0, (out - 1) * s + keff - n)
        lo = total // 2
        return lo, total - lo
    if padding == "VALID":
        return 0, 0
    p = int(padding)
    return p, p


def _pads2(H, W, kh, kw, sh, sw, dh, dw, padding):
    return (conv_pads(H, kh, sh, dh, pad_dim(padding, 0)),
            conv_pads(W, kw, sw, dw, pad_dim(padding, 1)))



def quantize_cache(x: np.ndarray, cache_dtype: str) -> np.ndarray:
    """Round accepted values through the pipeline's cache dtype.

    The TPU pipeline stores accepted values as ``x.astype(cache_dtype)``;
    an oracle keeping full-precision accepts diverges from it at the tau
    boundary (sub-ulp drift accumulates differently), so mask/cache
    parity claims only hold when the golden run quantizes the SAME way.
    float32 (the default and what CPU CI runs) is a no-op."""
    if cache_dtype in ("float32", "f32"):
        return x
    import ml_dtypes
    return x.astype(ml_dtypes.bfloat16).astype(np.float32) \
        if cache_dtype in ("bfloat16", "bf16") else x.astype(cache_dtype)


def dense_conv2d(x: np.ndarray, w: np.ndarray, b: Optional[np.ndarray],
                 stride=(1, 1), dilation=(1, 1), padding="SAME",
                 activation: Optional[str] = None) -> np.ndarray:
    """Plain float64-accumulated conv2d, HWC x HWIO -> HWC."""
    kh, kw, cin, cout = w.shape
    sh, sw = stride
    dh, dw = dilation
    H, W, C = x.shape
    assert C == cin, (C, cin)
    (plo_h, phi_h), (plo_w, phi_w) = _pads2(H, W, kh, kw, sh, sw, dh, dw,
                                            padding)
    xp = np.pad(x, ((plo_h, phi_h), (plo_w, phi_w), (0, 0)))
    Ho = conv_out_size(H, kh, sh, dh, pad_dim(padding, 0))
    Wo = conv_out_size(W, kw, sw, dw, pad_dim(padding, 1))
    y = np.zeros((Ho, Wo, cout), dtype=np.float64)
    for dy in range(kh):
        for dx in range(kw):
            patch = xp[dy * dh: dy * dh + (Ho - 1) * sh + 1: sh,
                       dx * dw: dx * dw + (Wo - 1) * sw + 1: sw, :]
            y += patch.astype(np.float64) @ w[dy, dx].astype(np.float64)
    if b is not None:
        y += b.astype(np.float64)
    if activation == "relu":
        y = np.maximum(y, 0.0)
    return y.astype(x.dtype)


def dense_maxpool2d(x: np.ndarray, window=(2, 2), stride=(2, 2),
                    padding="VALID") -> np.ndarray:
    kh, kw = window
    sh, sw = stride
    H, W, C = x.shape
    (plo_h, phi_h), (plo_w, phi_w) = _pads2(H, W, kh, kw, sh, sw, 1, 1,
                                            padding)
    xp = np.pad(x, ((plo_h, phi_h), (plo_w, phi_w), (0, 0)),
                constant_values=-np.inf)
    Ho = conv_out_size(H, kh, sh, 1, pad_dim(padding, 0))
    Wo = conv_out_size(W, kw, sw, 1, pad_dim(padding, 1))
    y = np.full((Ho, Wo, C), -np.inf, dtype=x.dtype)
    for dy in range(kh):
        for dx in range(kw):
            patch = xp[dy: dy + (Ho - 1) * sh + 1: sh,
                       dx: dx + (Wo - 1) * sw + 1: sw, :]
            y = np.maximum(y, patch)
    return y


def dense_upsample(x: np.ndarray, scale=(2, 2), method="nearest") -> np.ndarray:
    if method == "nearest":
        return np.repeat(np.repeat(x, scale[0], axis=0), scale[1], axis=1)
    raise NotImplementedError(method)


# --------------------------- change propagation -----------------------------


def propagate_mask(changed_in: np.ndarray, k: Tuple[int, int], s: Tuple[int, int],
                   d: Tuple[int, int], padding: str) -> np.ndarray:
    """Stage 2: input change map -> changed-output map (receptive-field OR).

    Output pixel (i, j) reads input rows i*s - pad + dy*d for dy in [0, kh);
    it must be recomputed iff any such input pixel changed.
    """
    kh, kw = k
    sh, sw = s
    dh, dw = d
    H, W = changed_in.shape
    (plo_h, phi_h), (plo_w, phi_w) = _pads2(H, W, kh, kw, sh, sw, dh, dw,
                                            padding)
    cp = np.pad(changed_in, ((plo_h, phi_h), (plo_w, phi_w)))
    Ho = conv_out_size(H, kh, sh, dh, pad_dim(padding, 0))
    Wo = conv_out_size(W, kw, sw, dw, pad_dim(padding, 1))
    out = np.zeros((Ho, Wo), dtype=bool)
    for dy in range(kh):
        for dx in range(kw):
            out |= cp[dy * dh: dy * dh + (Ho - 1) * sh + 1: sh,
                      dx * dw: dx * dw + (Wo - 1) * sw + 1: sw]
    return out


# ------------------------------ layer states --------------------------------


@dataclasses.dataclass
class GoldenLayerState:
    in_cache: Optional[np.ndarray] = None   # last ACCEPTED input feature map
    out_cache: Optional[np.ndarray] = None  # cached output feature map
    # compute accounting for the frame just processed:
    changed_in: int = 0      # changed input pixels (stage 1)
    changed_out: int = 0     # recomputed output pixels (stage 2/5)
    total_out: int = 0


# ------------------------------ CB layer steps -------------------------------


def cb_conv_step(x: np.ndarray, w: np.ndarray, b: Optional[np.ndarray],
                 spec: ConvSpec, state: GoldenLayerState,
                 cache_dtype: str = "float32"
                 ) -> Tuple[np.ndarray, GoldenLayerState]:
    """One frame through a change-based conv layer, exact per-pixel semantics."""
    if state.in_cache is None:
        x = quantize_cache(x, cache_dtype)
        # Frame 0 cold start: full dense pass populates both caches
        # (SURVEY.md §3.2 "frame 0: all changed").
        y = dense_conv2d(x, w, b, spec.stride, spec.dilation, spec.padding,
                         spec.activation)
        return y.copy(), GoldenLayerState(
            in_cache=x.copy(), out_cache=y.copy(),
            changed_in=x.shape[0] * x.shape[1],
            changed_out=y.shape[0] * y.shape[1],
            total_out=y.shape[0] * y.shape[1])

    # Stage 1: per-pixel change detection against the last accepted value.
    # Detection runs in float32 on the RAW input — matching the TPU
    # pipeline bit-for-bit (it diffs x at compute precision against the
    # cache) so masks never diverge at the tau boundary (tau itself is
    # rounded to f32). Only the ACCEPTED write is rounded through the
    # pipeline's cache dtype (quantize_cache): a full-precision accept
    # would drift from a bf16 pipeline by more than reassociation.
    diff = np.max(np.abs(x.astype(np.float32) - state.in_cache.astype(np.float32)),
                  axis=-1)
    changed_in = diff > np.float32(spec.threshold)
    in_cache = np.where(changed_in[..., None],
                        quantize_cache(x, cache_dtype), state.in_cache)

    # Stage 2: receptive-field propagation to the changed-output map.
    changed_out = propagate_mask(changed_in, spec.kernel, spec.stride,
                                 spec.dilation, spec.padding)

    # Stages 3-5: recompute exactly the changed outputs from the updated cache.
    # (Computing the full conv and masking is value-identical; see module doc.)
    y_full = dense_conv2d(in_cache, w, b, spec.stride, spec.dilation,
                          spec.padding, spec.activation)
    out_cache = np.where(changed_out[..., None], y_full, state.out_cache)

    new_state = GoldenLayerState(
        in_cache=in_cache, out_cache=out_cache.copy(),
        changed_in=int(changed_in.sum()), changed_out=int(changed_out.sum()),
        total_out=changed_out.size)
    return out_cache.copy(), new_state


def cb_pool_step(x: np.ndarray, spec: PoolSpec, state: GoldenLayerState,
                 cache_dtype: str = "float32"
                 ) -> Tuple[np.ndarray, GoldenLayerState]:
    """One frame through a change-based max-pool layer (CB19 §IV-F semantics)."""
    if state.in_cache is None:
        x = quantize_cache(x, cache_dtype)
        y = dense_maxpool2d(x, spec.window, spec.stride, spec.padding)
        return y.copy(), GoldenLayerState(
            in_cache=x.copy(), out_cache=y.copy(),
            changed_in=x.shape[0] * x.shape[1],
            changed_out=y.shape[0] * y.shape[1],
            total_out=y.shape[0] * y.shape[1])

    diff = np.max(np.abs(x.astype(np.float32) - state.in_cache.astype(np.float32)),
                  axis=-1)
    changed_in = diff > np.float32(spec.threshold)
    in_cache = np.where(changed_in[..., None],
                        quantize_cache(x, cache_dtype), state.in_cache)
    changed_out = propagate_mask(changed_in, spec.window, spec.stride, (1, 1),
                                 spec.padding)
    y_full = dense_maxpool2d(in_cache, spec.window, spec.stride, spec.padding)
    out_cache = np.where(changed_out[..., None], y_full, state.out_cache)
    new_state = GoldenLayerState(
        in_cache=in_cache, out_cache=out_cache.copy(),
        changed_in=int(changed_in.sum()), changed_out=int(changed_out.sum()),
        total_out=changed_out.size)
    return out_cache.copy(), new_state


# ----------------------------- network runner -------------------------------


class GoldenCBNet:
    """A sequential CB network: list of (spec, params) with per-layer state.

    params for ConvSpec is (w, b); PoolSpec/UpsampleSpec take None.
    """

    def __init__(self, layers: List[Tuple[object, object]],
                 cache_dtype: str = "float32"):
        self.layers = layers
        # cache_dtype: quantize accepted values like the pipeline's
        # caches (quantize_cache doc) — required for mask/cache parity
        # claims against a bf16 pipeline; float32 default matches CPU CI
        self.cache_dtype = cache_dtype
        self.states: List[GoldenLayerState] = [GoldenLayerState() for _ in layers]

    def reset(self):
        self.states = [GoldenLayerState() for _ in self.layers]

    def __call__(self, x: np.ndarray) -> np.ndarray:
        for i, (spec, params) in enumerate(self.layers):
            if isinstance(spec, ConvSpec):
                if spec.use_cb:
                    x, self.states[i] = cb_conv_step(
                        x, params[0], params[1], spec, self.states[i],
                        self.cache_dtype)
                else:
                    x = dense_conv2d(x, params[0], params[1], spec.stride,
                                     spec.dilation, spec.padding, spec.activation)
            elif isinstance(spec, PoolSpec):
                if spec.use_cb:
                    x, self.states[i] = cb_pool_step(
                        x, spec, self.states[i], self.cache_dtype)
                else:
                    x = dense_maxpool2d(x, spec.window, spec.stride, spec.padding)
            elif isinstance(spec, UpsampleSpec):
                x = dense_upsample(x, spec.scale, spec.method)
            else:
                raise TypeError(spec)
        return x

    def dense(self, x: np.ndarray) -> np.ndarray:
        """Dense forward with the same weights (correctness/accuracy oracle)."""
        for spec, params in self.layers:
            if isinstance(spec, ConvSpec):
                x = dense_conv2d(x, params[0], params[1], spec.stride,
                                 spec.dilation, spec.padding, spec.activation)
            elif isinstance(spec, PoolSpec):
                x = dense_maxpool2d(x, spec.window, spec.stride, spec.padding)
            elif isinstance(spec, UpsampleSpec):
                x = dense_upsample(x, spec.scale, spec.method)
            else:
                raise TypeError(f"dense(): unsupported spec {spec} — a "
                                "silent pass-through would corrupt the "
                                "oracle")
        return x
