"""On-chip probe: PACKED PATCH-PLANE sparse stem vs the shipped dense_cached.

The dense_cached stem recomputes AND rewrites the full (720,1280,128) out
map every frame (~555 us/frame: dot 386 + pad 85 + VMEM copy 83; xprof r3) —
it is output-write-bound (236 MB @ 0.82 TB/s = 288 us). Every prior sparse
formulation died on one of two walls: Mosaic rejects cin=3 operands
(lane-pad 42x), and XLA's gather/scatter lowering serializes (sparse-write
stem 4.7-8.3 ms). This probe threads between them:

  1. Per frame, XLA materializes the im2col patches ONCE into a PACKED
     lane-aligned buffer P: (Hop, Wop/4, 128) bf16 — lane row = 4 adjacent
     output pixels x 32 patch channels (27 real + 5 zero). 59 MB physical
     (zero lane-pad waste), built from 36 strided slices of the accepted
     HWC storage + zero blocks in ONE concat (fusable, no rank-3 small-lane
     intermediate wider than 32).
  2. A Pallas kernel (same scalar-prefetch + 4-deep DMA pipeline shape as
     ops/pallas/delta_conv) recomputes ONLY dirty tiles: DMA P[8i:8i+8,
     8j:8j+8, :] -> one (64,128)x(128,4*cout) MXU dot against a
     BLOCK-DIAGONAL weight (4 pixel groups on the lane axis) -> reshape
     (8,32,cout) (pure row-major merge, no transpose) -> DMA-scatter into
     the aliased out cache. Stem tiles are (8,32) px: Mosaic requires
     8-aligned sublane DMA slices, so the packed-group extent per tile must
     be 8 -> tile width 8*G = 32. Coarser stem recompute granularity is the
     price (sprites round up ~25% more area than at 8x8).

Zero lanes contribute exact +0.0 in fp32, so the block-diag dot should be
bit-identical to a plain K=32 im2col dot with the same m-order; the probe
asserts this (it gates whether the dense fallback can reuse _accumulate).
"""
import functools
import time
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cbinfer_tpu.ops.geometry import conv_tile_geometry
from cbinfer_tpu.ops import delta_conv as dc
from cbinfer_tpu import network as net
from cbinfer_tpu.config import ConvSpec

H, W, CIN, COUT = 720, 1280, 3, 128
G = 4  # pixels packed per 128-lane row
KP = 32  # patch channels per pixel (27 real + 5 zero)


def build_patch_planes(storage, g):
    """(Hop, Wop/G, 128) packed patch planes from the padded HWC storage."""
    kh, kw = g.kernel
    pieces = []
    for k in range(G):
        for dy in range(kh):
            for dx in range(kw):
                start = g.dx0 + dx + k
                pieces.append(lax.slice(
                    storage, (dy, start, 0),
                    (dy + g.out_h_pad, start + (g.out_w_pad // G - 1) * G + 1,
                     g.cin), (1, G, 1)))
        pieces.append(jnp.zeros(
            (g.out_h_pad, g.out_w_pad // G, KP - kh * kw * g.cin),
            storage.dtype))
    return jnp.concatenate(pieces, axis=-1)


def selection_kernel(g):
    """0/1 kernel for the flat strided conv that materializes P in ONE
    lax.conv: input (1, 1, Hs, Ws*cin) NCHW flat storage sliced from col
    3*(dx0+0)=21..., window (kh, 3*(kw-1+G)), stride (1, 3*G) -> P.
    K[l, 0, dy, j] = 1 iff l = 32k+m, m=(3dy+dx)*3+c, j=3(dx+k)+c."""
    kh, kw = g.kernel
    cin = g.cin
    wwin = cin * (kw - 1 + G)
    K = np.zeros((G * KP, 1, kh, wwin), np.float32)
    for k in range(G):
        for dy in range(kh):
            for dx in range(kw):
                for c in range(cin):
                    m = (dy * kw + dx) * cin + c
                    K[k * KP + m, 0, dy, cin * (dx + k) + c] = 1.0
    return jnp.asarray(K, jnp.bfloat16)


def build_patch_planes_conv(storage, g, K):
    """P via ONE flat strided conv — no small-lane intermediate anywhere."""
    Hs, Ws, cin = storage.shape
    F = storage.reshape(Hs, Ws * cin)
    base = cin * g.dx0
    F3 = lax.slice(F, (0, base), (Hs, Ws * cin))
    y = lax.conv_general_dilated(
        F3[None, None].astype(jnp.bfloat16), K,
        window_strides=(1, cin * G), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NHWC"),
        preferred_element_type=jnp.bfloat16)[0]
    return y[:g.out_h_pad, :g.out_w_pad // G, :]


def pack_weights(w, b, cout_pad):
    """w (kh,kw,cin,cout) -> block-diag (128, G*cout_pad) + bias (G*cout_pad)."""
    kh, kw, cin, cout = w.shape
    wf = w.reshape(kh * kw * cin, cout)
    wp = np.zeros((G * KP, G * cout_pad), np.float32)
    for k in range(G):
        wp[k * KP:k * KP + kh * kw * cin, k * cout_pad:k * cout_pad + cout] = \
            np.asarray(wf, np.float32)
    bp = np.zeros((G * cout_pad,), np.float32)
    for k in range(G):
        bp[k * cout_pad:k * cout_pad + cout] = np.asarray(b, np.float32)
    return jnp.asarray(wp), jnp.asarray(bp)


# --- pre-permuted P': no selection dot at all -------------------------------
# P'[i, g, 12*(dlt-1) + t] = F[i+dy, 12*(g+dlt) + t] for dy rows stacked:
# lane r = 36*dy + 12*(dlt-1) + t, dlt in {1,2,3}. Built from NINE contiguous
# full-width slices of the flat storage + one zero block — one concat, one
# 59MB write, zero gathers. The im2col selection is folded into the conv
# weights instead: output pixel 4g+k channel m=(3dy+dx)*3+c reads source
# lane q = cin*(dx0+dx+k)+c = 12*dlt + t -> weight row r = 36*dy + q - 12.
def build_patch_planes_permuted(storage, g):
    Hs, Ws, cin = storage.shape
    F = storage.reshape(Hs, Ws * cin)
    kh = g.kernel[0]
    pieces = []
    for dy in range(kh):
        for dlt in (1, 2, 3):
            pieces.append(lax.slice(
                F, (dy, cin * G * dlt),
                (dy + g.out_h_pad, cin * G * dlt + g.out_w_pad * cin)
            ).reshape(g.out_h_pad, g.out_w_pad // G, cin * G))
    pieces.append(jnp.zeros(
        (g.out_h_pad, g.out_w_pad // G, G * KP - 9 * cin * G),
        storage.dtype))
    return jnp.concatenate(pieces, axis=-1)


def pack_weights_permuted(w, b, cout_pad, g):
    """Weights for the P'-operand: row r = 36*dy + (q - 12) where
    q = cin*(dx0+dx+k) + c, col block k."""
    kh, kw, cin, cout = w.shape
    wp = np.zeros((G * KP, G * cout_pad), np.float32)
    wnp = np.asarray(w, np.float32)
    for k in range(G):
        for dy in range(kh):
            for dx in range(kw):
                for c in range(cin):
                    q = cin * (g.dx0 + dx + k) + c
                    r = (cin * G * kh // 1) * 0 + 36 * dy + q - cin * G
                    assert 0 <= r < 9 * cin * G, (r, q)
                    wp[r, k * cout_pad:k * cout_pad + cout] += wnp[dy, dx, c]
    bp = np.zeros((G * cout_pad,), np.float32)
    for k in range(G):
        bp[k * cout_pad:k * cout_pad + cout] = np.asarray(b, np.float32)
    return jnp.asarray(wp), jnp.asarray(bp)


def _patch_stem_kernel(idx_ref, m_ref, p_ref, w_ref, b_ref, out_in_ref,
                       out_ref, win_buf, y_buf, in_sems, out_sems,
                       *, g, cout_pad, nbuf=4):
    del out_in_ref
    m = m_ref[0]
    gpt = g.tw // G  # packed groups per tile (8/4 = 2)

    def in_copy(slot, i):
        t = idx_ref[i]
        ti = t // g.tiles_w
        tj = t - ti * g.tiles_w
        return pltpu.make_async_copy(
            p_ref.at[pl.ds(ti * g.th, g.th), pl.ds(tj * gpt, gpt), :],
            win_buf.at[slot], in_sems.at[slot])

    def out_copy(slot, i):
        t = idx_ref[i]
        ti = t // g.tiles_w
        tj = t - ti * g.tiles_w
        return pltpu.make_async_copy(
            y_buf.at[slot],
            out_ref.at[pl.ds(ti * g.th, g.th), pl.ds(tj * g.tw, g.tw), :],
            out_sems.at[slot])

    for k in range(nbuf - 1):
        @pl.when(k < m)
        def _(k=k):
            in_copy(k, k).start()

    def body(i, _):
        slot = lax.rem(i, nbuf)

        @pl.when(i + nbuf - 1 < m)
        def _():
            in_copy(lax.rem(i + nbuf - 1, nbuf), i + nbuf - 1).start()

        in_copy(slot, i).wait()
        win = win_buf[slot].reshape(g.th * gpt, G * KP)
        acc = jnp.dot(win, w_ref[...], preferred_element_type=jnp.float32)
        acc = jnp.maximum(acc + b_ref[0], 0.0)

        @pl.when(i >= nbuf)
        def _():
            out_copy(slot, i - nbuf).wait()

        y_buf[slot] = acc.reshape(g.th, g.tw, cout_pad).astype(y_buf.dtype)
        out_copy(slot, i).start()

    lax.fori_loop(0, m, body, None)

    for k in range(nbuf):
        @pl.when(m - nbuf + k >= 0)
        def _(k=k):
            j = m - nbuf + k
            out_copy(lax.rem(j, nbuf), j).wait()


def patch_stem_pallas(p, idx, count, wp, bp, out_cache, g):
    cout_pad = out_cache.shape[-1]
    NBUF = 4
    gpt = g.tw // G
    kern = functools.partial(_patch_stem_kernel, g=g, cout_pad=cout_pad,
                             nbuf=NBUF)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # P
            pl.BlockSpec(memory_space=pltpu.VMEM),             # packed W
            pl.BlockSpec(memory_space=pltpu.VMEM),             # packed b
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # out (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, g.th, gpt, G * KP), p.dtype),
            pltpu.VMEM((NBUF, g.th, g.tw, cout_pad), out_cache.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_cache.shape, out_cache.dtype),
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=2 * g.th * g.tw * G * KP * cout_pad * idx.shape[0],
            bytes_accessed=idx.shape[0] * (g.th * g.tw * KP
                                           + g.th * g.tw * cout_pad) * 2,
            transcendentals=0),
    )(idx, count.reshape(1), p, wp, bp.reshape(1, -1), out_cache)


def timeit(name, f, reps, *args, donate_out=None):
    out = f(*args)
    jax.block_until_ready(out)
    best = []
    for _round in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*args)
        jax.block_until_ready(out)
        best.append((time.perf_counter() - t0 - 0.030) / reps * 1e3)
    ms = min(best)
    print(f"{name}: {ms:.3f} ms", flush=True)
    return ms


def main():
    spec = ConvSpec(features=COUT, kernel=(3, 3), stride=(1, 1),
                    dilation=(1, 1), padding="SAME", activation="relu")
    g = conv_tile_geometry((H, W, CIN), (3, 3), (1, 1), (1, 1), "SAME", 8, 32)
    print(f"geometry: tiles {g.tiles_h}x{g.tiles_w}={g.n_tiles}, "
          f"store {g.store_shape}, dx0={g.dx0}", flush=True)
    rng = np.random.default_rng(0)
    interior = rng.random((H, W, CIN)).astype(np.float32)
    storage = dc.make_storage(g, 0.0, 0.0, jnp.bfloat16)
    storage = dc.storage_update_interior(
        storage, jnp.asarray(interior, jnp.bfloat16), g)
    w = jnp.asarray(rng.standard_normal((3, 3, CIN, COUT)) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((COUT,)) * 0.01, jnp.bfloat16)
    wp, bp = pack_weights(w, b, COUT)
    out_cache = jnp.zeros((g.out_h_pad, g.out_w_pad, COUT), jnp.bfloat16)

    # --- dense_cached conv side (the shipped stem, minus detect) ---
    wpad, bpad = w, b

    @jax.jit
    def f_dense(storage):
        inter = dc.storage_interior(storage, g).astype(jnp.bfloat16)
        y = net.dense_conv(inter, wpad, bpad, spec, jnp.bfloat16)
        y = jnp.pad(y, ((0, g.out_h_pad - g.out_h),
                        (0, g.out_w_pad - g.out_w), (0, 0)))
        return y.astype(jnp.bfloat16)

    # --- patch planes materialization ---
    @jax.jit
    def f_planes(storage):
        return build_patch_planes(storage, g)

    p = f_planes(storage)
    print("P shape:", p.shape, p.dtype, flush=True)

    K = selection_kernel(g)

    @jax.jit
    def f_planes_conv(storage):
        return build_patch_planes_conv(storage, g, K)

    p2 = f_planes_conv(storage)
    print("P(conv) == P(slices) (bit):", bool(jnp.all(p2 == p)), flush=True)

    wp2, bp2 = pack_weights_permuted(w, b, COUT, g)

    @jax.jit
    def f_planes_perm(storage):
        return build_patch_planes_permuted(storage, g)

    pperm = f_planes_perm(storage)
    print("P' shape:", pperm.shape, flush=True)

    # --- full patch-sparse step at density d ---
    def make_idx(frac, seed):
        m = int(g.n_tiles * frac)
        ids = np.sort(np.random.default_rng(seed).choice(
            g.n_tiles, size=m, replace=False)).astype(np.int32)
        idx = np.full((m,), 0, np.int32)
        idx[:m] = ids
        return jnp.asarray(idx), jnp.asarray(m, jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(2,), static_argnums=())
    def f_patch(storage, idx, out_cache, count):
        p = build_patch_planes_permuted(storage, g)
        return patch_stem_pallas(p, idx, count, wp2, bp2, out_cache, g)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def f_kernel_only(p, idx, out_cache, count):
        return patch_stem_pallas(p, idx, count, wp, bp, out_cache, g)

    # correctness first: all-tiles patch pass == dense-from-P dot
    idx_all = jnp.arange(g.n_tiles, dtype=jnp.int32)
    cnt_all = jnp.asarray(g.n_tiles, jnp.int32)
    y_patch_full = f_kernel_only(p, idx_all,
                                 jnp.zeros_like(out_cache), cnt_all)

    @jax.jit
    def f_dense_from_p(p):
        acc = jnp.dot(p.reshape(-1, G * KP), wp,
                      preferred_element_type=jnp.float32)
        acc = jnp.maximum(acc + bp, 0.0)
        return acc.reshape(g.out_h_pad, g.out_w_pad // G, G,
                           COUT).reshape(g.out_h_pad, g.out_w_pad,
                                         COUT).astype(jnp.bfloat16)

    y_dp = f_dense_from_p(p)
    bit_same_dp = bool(jnp.all(y_patch_full == y_dp))
    print("patch-kernel == dense-from-P (bit):", bit_same_dp, flush=True)

    # vs the im2col K=32 dot with same m-order (the _accumulate form)
    @jax.jit
    def f_im2col(storage):
        def tap(dy, dx):
            return lax.slice(
                storage.astype(jnp.bfloat16), (dy, g.dx0 + dx, 0),
                (dy + g.out_h_pad, g.dx0 + dx + g.out_w_pad, CIN),
                (1, 1, 1))
        acc = dc._accumulate(tap, g.out_h_pad * g.out_w_pad, w, b, g,
                             "relu", jnp.bfloat16)
        return acc.reshape(g.out_h_pad, g.out_w_pad, COUT).astype(jnp.bfloat16)

    y_i2c = f_im2col(storage)
    bit_same_i2c = bool(jnp.all(y_patch_full == y_i2c))
    mx = float(jnp.max(jnp.abs(y_patch_full.astype(jnp.float32)
                               - y_i2c.astype(jnp.float32))))
    print(f"patch-kernel == im2col K=32 dot (bit): {bit_same_i2c} "
          f"(max abs diff {mx:.2e})", flush=True)
    y_lax = f_dense(storage)
    mx2 = float(jnp.max(jnp.abs(y_patch_full.astype(jnp.float32)
                                - y_lax.astype(jnp.float32))))
    print(f"vs lax.conv dense_cached: max abs diff {mx2:.2e}", flush=True)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def f_kernel_perm(p, idx, out_cache, count):
        return patch_stem_pallas(p, idx, count, wp2, bp2, out_cache, g)

    y_perm_full = f_kernel_perm(pperm, idx_all, jnp.zeros_like(out_cache),
                                cnt_all)
    bit_perm = bool(jnp.all(y_perm_full == y_patch_full))
    mxp = float(jnp.max(jnp.abs(y_perm_full.astype(jnp.float32)
                                - y_patch_full.astype(jnp.float32))))
    print(f"permuted-P' kernel == patch kernel (bit): {bit_perm} "
          f"(max abs diff {mxp:.2e})", flush=True)

    # --- timings (interleaved rounds; >=0.3 s windows) ---
    timeit("dense_cached conv (shipped)", f_dense, 300, storage)
    timeit("P materialization alone", f_planes, 60, storage)
    timeit("P materialization via flat conv", f_planes_conv, 300, storage)
    timeit("P' materialization (9-slice concat)", f_planes_perm, 300, storage)
    for frac in (0.05, 0.15, 0.30):
        idx, cnt = make_idx(frac, 1)
        oc = jnp.zeros_like(out_cache)
        t0 = time.perf_counter()
        oc = f_kernel_only(p, idx, oc, cnt)
        jax.block_until_ready(oc)
        ms_tot = []
        for _round in range(3):
            t0 = time.perf_counter()
            for _ in range(300):
                oc = f_kernel_only(p, idx, oc, cnt)
            jax.block_until_ready(oc)
            ms_tot.append((time.perf_counter() - t0 - 0.030) / 300 * 1e3)
        print(f"patch kernel only @ {frac:.2f}: {min(ms_tot):.3f} ms",
              flush=True)
        oc2 = jnp.zeros_like(out_cache)
        oc2 = f_patch(storage, idx, oc2, cnt)
        jax.block_until_ready(oc2)
        ms_tot = []
        for _round in range(3):
            t0 = time.perf_counter()
            for _ in range(300):
                oc2 = f_patch(storage, idx, oc2, cnt)
            jax.block_until_ready(oc2)
            ms_tot.append((time.perf_counter() - t0 - 0.030) / 300 * 1e3)
        print(f"P+kernel full step @ {frac:.2f}: {min(ms_tot):.3f} ms",
              flush=True)
    # cold-start equivalent: all tiles through the kernel
    oc = jnp.zeros_like(out_cache)
    oc = f_patch(storage, idx_all, oc, cnt_all)
    jax.block_until_ready(oc)
    ms_tot = []
    for _round in range(3):
        t0 = time.perf_counter()
        for _ in range(100):
            oc = f_patch(storage, idx_all, oc, cnt_all)
        jax.block_until_ready(oc)
        ms_tot.append((time.perf_counter() - t0 - 0.030) / 100 * 1e3)
    print(f"P+kernel full step @ 1.00: {min(ms_tot):.3f} ms", flush=True)


if __name__ == "__main__":
    main()
