"""Sequential network IR utilities + dense baseline path (SURVEY.md C11).

A network is a tuple of LayerSpecs (config.py) plus a params list (one entry
per layer: (w, b) for conv, None otherwise). The dense path executes the
same weights with XLA's native conv — the correctness oracle at tau=0 and
the performance baseline the change-based path is measured against
(reference: plain cuDNN forward, arXiv 1704.04313 §4).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .config import ConvSpec, PipelineConfig, PoolSpec, UpsampleSpec
from .ops.geometry import conv_out_size, pad_dim


def init_params(specs: Sequence, in_shape: Tuple[int, int, int],
                rng: jax.Array, dtype=jnp.float32) -> List:
    """He-normal conv weights, zero biases; shapes follow the spec chain."""
    params = []
    c = in_shape[2]
    for spec in specs:
        if isinstance(spec, ConvSpec):
            kh, kw = spec.kernel
            rng, k = jax.random.split(rng)
            fan_in = kh * kw * c
            w = (jax.random.normal(k, (kh, kw, c, spec.features), dtype)
                 * math.sqrt(2.0 / fan_in))
            b = jnp.zeros((spec.features,), dtype) if spec.use_bias else None
            params.append((w, b))
            c = spec.features
        else:
            params.append(None)
    return params


def out_shapes(specs: Sequence, in_shape: Tuple[int, int, int]
               ) -> List[Tuple[int, int, int]]:
    """Static shape chain: shape of each layer's OUTPUT."""
    shapes = []
    h, w, c = in_shape
    for spec in specs:
        if isinstance(spec, ConvSpec):
            h = conv_out_size(h, spec.kernel[0], spec.stride[0],
                              spec.dilation[0], pad_dim(spec.padding, 0))
            w = conv_out_size(w, spec.kernel[1], spec.stride[1],
                              spec.dilation[1], pad_dim(spec.padding, 1))
            c = spec.features
        elif isinstance(spec, PoolSpec):
            h = conv_out_size(h, spec.window[0], spec.stride[0], 1,
                              pad_dim(spec.padding, 0))
            w = conv_out_size(w, spec.window[1], spec.stride[1], 1,
                              pad_dim(spec.padding, 1))
        elif isinstance(spec, UpsampleSpec):
            h, w = h * spec.scale[0], w * spec.scale[1]
        else:
            raise TypeError(spec)
        shapes.append((h, w, c))
    return shapes


# Trace-time gate for the pointwise-conv-as-matmul form, consumed by
# convert.dense_conv_on_feature (the CB path's trailing classifier on
# PADDED Feature storage — where lax.conv pays a ~21 us/frame input
# layout copy, xprof r4). ADOPTED ON per the measured interleaved A/B
# (scripts/exp_pointwise_ab.py, EXP_pointwise_ab.json: CB 1.0465x).
# The DENSE baseline keeps the lax.conv form: its 1x1 sits in a natural
# conv chain where XLA fuses it (the A/B measured dense 0.989x under a
# global flip — scoping to the Feature path takes the CB win without
# touching dense).
POINTWISE_DOT = True


def pointwise_dot_conv(x: jnp.ndarray, w: jnp.ndarray,
                       b: Optional[jnp.ndarray], spec: ConvSpec,
                       compute_dtype=jnp.float32) -> jnp.ndarray:
    """1x1 stride-1 conv as (H*W, cin) @ (cin, cout) — reads the input
    storage directly (minor-dim-preserving reshape, no layout copy)."""
    compute_dtype = jnp.dtype(compute_dtype)
    assert spec.kernel == (1, 1) and spec.stride == (1, 1) \
        and spec.dilation == (1, 1)
    H, W, cin = x.shape
    cout = w.shape[3]
    y = jnp.dot(x.reshape(H * W, cin).astype(compute_dtype),
                w.reshape(cin, cout).astype(compute_dtype),
                preferred_element_type=compute_dtype)
    if b is not None:
        y = y + b.astype(compute_dtype)
    if spec.activation == "relu":
        y = jnp.maximum(y, jnp.asarray(0.0, compute_dtype))
    return y.reshape(H, W, cout)


def dense_conv(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray],
               spec: ConvSpec, compute_dtype=jnp.float32) -> jnp.ndarray:
    """XLA-native conv on one HWC frame.

    The conv accumulates in fp32 internally either way; emitting the output
    directly in compute_dtype avoids materializing a full fp32 map + a
    separate convert pass (measured ~1ms/frame at 360p x 128ch).

    Small-cin stems (cin*k^2 <= 64, stride 1, SAME) go through an explicit
    im2col matmul: XLA's N=1 HWC conv for cin=3 picks a T(2,128) layout with
    several full-map copies (~5ms/frame at 720p); the im2col matmul avoids
    the layout trap."""
    compute_dtype = jnp.dtype(compute_dtype)
    kh, kw = spec.kernel
    cin = w.shape[2]
    # NOTE (r3 in-pipeline probe): zero-padding cin 3->8 and using the
    # native lax.conv measured 206 fps vs 722 for this im2col at the
    # 720p scene bench (and slowed the DENSE path 275->236) — the conv's
    # layout choice inside the scan is pathological regardless of cin
    # padding. A standalone scan probe said the opposite (2.6 vs 6.3
    # ms/frame); only in-pipeline numbers count for layout questions.
    if (cin * kh * kw <= 64 and spec.stride == (1, 1)
            and spec.dilation == (1, 1) and spec.padding == "SAME"):
        H, W, _ = x.shape
        cout = w.shape[3]
        plo_h, phi_h = (kh - 1) // 2, kh // 2
        plo_w, phi_w = (kw - 1) // 2, kw // 2
        xp = jnp.pad(x.astype(compute_dtype),
                     ((plo_h, phi_h), (plo_w, phi_w), (0, 0)))
        cols = [lax.slice(xp, (dy, dx, 0), (dy + H, dx + W, cin))
                for dy in range(kh) for dx in range(kw)]
        patches = jnp.concatenate(cols, axis=-1).reshape(H * W, kh * kw * cin)
        y = jnp.dot(patches,
                    w.astype(compute_dtype).reshape(kh * kw * cin, cout),
                    preferred_element_type=compute_dtype)
        if b is not None:
            y = y + b.astype(compute_dtype)
        if spec.activation == "relu":
            y = jnp.maximum(y, jnp.asarray(0.0, compute_dtype))
        return y.reshape(H, W, cout)
    y = lax.conv_general_dilated(
        x[None].astype(compute_dtype), w.astype(compute_dtype),
        window_strides=spec.stride,
        padding=(spec.padding if isinstance(spec.padding, str)
                 else [(p, p) for p in spec.padding]),
        rhs_dilation=spec.dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=compute_dtype)[0]
    if b is not None:
        y = y + b.astype(compute_dtype)
    if spec.activation == "relu":
        y = jnp.maximum(y, jnp.asarray(0.0, compute_dtype))
    return y


def dense_pool(x: jnp.ndarray, spec: PoolSpec) -> jnp.ndarray:
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(*spec.window, 1),
        window_strides=(*spec.stride, 1),
        padding=(spec.padding if isinstance(spec.padding, str)
                 else [(p, p) for p in spec.padding] + [(0, 0)]))


def upsample(x: jnp.ndarray, spec: UpsampleSpec) -> jnp.ndarray:
    if spec.method == "nearest":
        return jnp.repeat(jnp.repeat(x, spec.scale[0], 0), spec.scale[1], 1)
    h, w, _ = x.shape
    return jax.image.resize(
        x, (h * spec.scale[0], w * spec.scale[1], x.shape[2]), "bilinear")


def dense_apply(specs: Sequence, params: Sequence, x: jnp.ndarray,
                cfg: Optional[PipelineConfig] = None) -> jnp.ndarray:
    """Full dense forward of one HWC frame (the baseline path)."""
    compute_dtype = jnp.dtype(cfg.compute_dtype) if cfg else jnp.float32
    for spec, p in zip(specs, params):
        if isinstance(spec, ConvSpec):
            x = dense_conv(x, p[0], p[1], spec, compute_dtype)
        elif isinstance(spec, PoolSpec):
            x = dense_pool(x, spec)
        elif isinstance(spec, UpsampleSpec):
            x = upsample(x, spec)
        else:
            raise TypeError(spec)
    return x


def dense_flops(specs: Sequence, in_shape: Tuple[int, int, int]) -> int:
    """MAC*2 count of the dense forward (conv layers only)."""
    total = 0
    h, w, c = in_shape
    for spec, shape in zip(specs, out_shapes(specs, in_shape)):
        if isinstance(spec, ConvSpec):
            kh, kw = spec.kernel
            total += 2 * shape[0] * shape[1] * spec.features * kh * kw * c
        h, w, c = shape
    return total
