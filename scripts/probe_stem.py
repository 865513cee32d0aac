"""On-chip probe: stem (cin=3) detect+conv formulations at 720p.

The stem is every workload's fixed tax. Rank-3 small-C arrays get
pathological XLA layouts (r2: NHWC cin=3 conv ~5 ms; r3 xprof: the
HWC->planar transpose 0.56 ms, a flat<->HWC reshape 1.03 ms, the im2col
concat 0.4 ms). This probe times each candidate end to end — frame
(H, W*3 flat) -> detect+update -> conv -> (H, W, 128) — plus the pieces.

Variants:
  A  flat detect + reshape->HWC + im2col conv      (shipped dense_cached_flat)
  B  flat detect + FLAT STRIDED conv               (no rank-3 array at all:
     conv_general_dilated on (1, 1, H, 3W+6) NCHW, kernel (128,1,3,9),
     window stride (1,3) — the W*C dim IS the strided conv axis)
  C  HWC detect + im2col conv                      (old dense_cached)
"""
import time
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

H, W, CO = 720, 1280, 128
REPS = 30


def timeit(name, f, *args):
    r = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(r)[0].ravel()[:4].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _i in range(REPS):
        r = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(r)[0].ravel()[:4].astype(jnp.float32)))
    dt = (time.perf_counter() - t0 - 0.030) / REPS * 1e3
    print(f"{name}: {dt:.3f} ms", flush=True)
    return r


def main():
    from cbinfer_tpu.ops import detect as D
    rng = np.random.default_rng(0)
    xf = jnp.asarray(rng.random((H, W * 3)), jnp.float32)
    cf = jnp.asarray(rng.random((H, W * 3)), jnp.bfloat16)
    xh = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    ch = jnp.asarray(rng.random((H, W, 3)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, CO)) * 0.1, jnp.bfloat16)
    b = jnp.zeros((CO,), jnp.bfloat16)
    for a in (xf, cf, xh, ch, w):
        _ = float(jnp.sum(a.astype(jnp.float32)))

    # pieces
    timeit("flat detect", jax.jit(
        lambda x, c: D.detect_and_update_flat(x, c, 0.04, 3)), xf, cf)
    timeit("hwc detect", jax.jit(
        lambda x, c: D.detect_and_update(x, c, 0.04)), xh, ch)

    def conv_im2col_from_flat(s):
        x3 = s.reshape(H, W, 3).astype(jnp.bfloat16)
        xp = jnp.pad(x3, ((1, 1), (1, 1), (0, 0)))
        cols = [lax.slice(xp, (dy, dx, 0), (dy + H, dx + W, 3))
                for dy in range(3) for dx in range(3)]
        patches = jnp.concatenate(cols, -1).reshape(H * W, 27)
        y = jnp.dot(patches, w.reshape(27, CO),
                    preferred_element_type=jnp.bfloat16)
        return (jnp.maximum(y + b, 0)).reshape(H, W, CO)

    def conv_flat_strided(s):
        # (1, 1, H, 3W+6) NCHW, kernel (CO, 1, 3, 9), stride (1, 3):
        # output pixel (i, j) contracts rows i..i+2 x lanes 3j..3j+8 =
        # exactly the 3x3x3 receptive field in flat layout
        xp = jnp.pad(s.astype(jnp.bfloat16), ((1, 1), (3, 3)))
        wf = jnp.transpose(w, (3, 0, 1, 2)).reshape(CO, 1, 3, 9)
        # w[dy, dx, c, o] -> wf[o, 0, dy, 3*dx + c]: transpose gives
        # (o, dy, dx, c); reshape merges (dx, c) -> 3*dx + c  [o,dy,dx,c]
        y = lax.conv_general_dilated(
            xp[None, None], wf, window_strides=(1, 3), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NHWC"),
            preferred_element_type=jnp.bfloat16)[0]
        return jnp.maximum(y + b, 0)

    timeit("conv im2col (flat->HWC reshape)", jax.jit(conv_im2col_from_flat),
           cf)
    timeit("conv flat strided NCHW", jax.jit(conv_flat_strided), cf)

    # numerical agreement
    y1 = np.asarray(jax.jit(conv_im2col_from_flat)(cf), np.float32)
    y2 = np.asarray(jax.jit(conv_flat_strided)(cf), np.float32)
    print("max |im2col - strided|:", float(np.max(np.abs(y1 - y2))),
          flush=True)

    # end-to-end variants
    def variant_A(x, c):
        nc, ch_ = D.detect_and_update_flat(x, c, 0.04, 3)
        return conv_im2col_from_flat(nc), nc, ch_

    def variant_B(x, c):
        nc, ch_ = D.detect_and_update_flat(x, c, 0.04, 3)
        return conv_flat_strided(nc), nc, ch_

    def variant_C(x, c):
        nc, ch_ = D.detect_and_update(x, c, 0.04)
        xp = jnp.pad(nc.astype(jnp.bfloat16), ((1, 1), (1, 1), (0, 0)))
        cols = [lax.slice(xp, (dy, dx, 0), (dy + H, dx + W, 3))
                for dy in range(3) for dx in range(3)]
        patches = jnp.concatenate(cols, -1).reshape(H * W, 27)
        y = jnp.dot(patches, w.reshape(27, CO),
                    preferred_element_type=jnp.bfloat16)
        return (jnp.maximum(y + b, 0)).reshape(H, W, CO), nc, ch_

    timeit("A flat detect + im2col", jax.jit(variant_A), xf, cf)
    timeit("B flat detect + flat strided conv", jax.jit(variant_B), xf, cf)
    timeit("C hwc detect + im2col", jax.jit(variant_C), xh, ch)


if __name__ == "__main__":
    main()
