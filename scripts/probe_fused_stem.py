"""On-chip probe: FUSED-ASSEMBLY sparse stem — no packed-P state at all.

probe_patch_stem.py proved the block-diagonal packed-patch MXU dot is
bit-identical to the shipped dense stem and 4x faster at sparse
densities, but per-frame materialization of the packed buffer P costs
1.5+ ms.  probe_dma_constraints.py pinned Mosaic's DMA rules: lane
slices must be 128-aligned, sublane (2nd-minor) offsets 8-aligned, outer
row offsets free.  Those rules kill narrow per-tap updates of a
persistent P — and suggest something better: P is never needed.

Keep the accepted stem input as a LANE-ALIGNED flat cache
    flat4 (728, 5248) bf16,  flat4[1 + y, 4*(x+1) + c] = input[y, x, c]
(c=3 slot and spatial borders zero = the conv's SAME zero-padding).
Then for a dirty (8,32)-px output tile at (ti, tj):

  1. DMA  rt = flat4[8*ti : 8*ti+16, 128*tj : 128*tj+256]   (8 KB)
     — row offset 8-aligned, lane offset 128-aligned: legal and fast.
  2. Assemble packed patches IN VMEM with three selection matmuls
         acc[r, 128j + 12*(3dy+dx) + 3k + c] = rt[r+dy, 16j+4(k+dx)+c]
     via T_dy (256,1024) 0/1 matrices: acc = sum_dy rt[dy:dy+8] @ T_dy.
     Each output lane receives exactly one nonzero product of a 1.0
     with a bf16 value accumulated in f32 -> EXACT.
  3. win = acc.reshape(64, 128); the probe's block-diagonal conv dot
     win @ Wp (128, 512), +bias, ReLU -> (8,32,128) tile.
  4. DMA-scatter into the aliased out cache (untouched tiles keep
     bit-identical values).

Per tile: 8 KB in + 64 KB out + ~80 (8,128)x(128,128) MXU units; no
per-frame packing, no P state, no refresh path beyond accept-all.
Contraction order per output pixel is (dy, dx, c) — the same m-order as
the shipped im2col stem, so the result should be BIT-IDENTICAL; the
probe asserts this against the dense_cached form.
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
TH, TW = 8, 32            # output tile (px)
CP = 4                    # channels padded per px (3 real + 1 zero)
WIN_R, WIN_L = 16, 256    # DMA window rows x lanes
FH, FL = 728, 5248        # flat4 shape: 1+720+7 rows, 4*(1+1280+30.x) lanes
TILES_H, TILES_W = H // TH, W // TW
N_TILES = TILES_H * TILES_W


def to_flat4(frame):
    """(720,1280,3) -> (728, 5248) bf16 with the layout above."""
    f = jnp.pad(frame.astype(jnp.bfloat16),
                ((1, 7), (1, FL // CP - W - 1), (0, 1)))
    return f.reshape(FH, FL)


def from_flat4(flat):
    return flat.reshape(FH, FL // CP, CP)[1:1 + H, 1:1 + W, :CIN]


def selection_mats():
    """T_dy (3, 256, 1024) bf16 0/1 selection matrices.

    Patch lane layout matches probe_patch_stem's P: within each group j,
    lane = 32*k + m with m = (3*dy+dx)*3 + c — each pixel's 27 taps are
    CONTIGUOUS, so the MXU's f32 reduction groups terms exactly like the
    shipped im2col dense stem (bit-identity; the scattered 12-lane-block
    layout measured 1-ulp diffs from different zero interleaving).
    """
    T = np.zeros((3, WIN_L, 1024), np.float32)
    for dy in range(3):
        for j in range(8):
            for k in range(4):
                for dx in range(3):
                    for c in range(CIN):
                        q = 16 * j + 4 * (k + dx) + c
                        lane = 128 * j + 32 * k + (3 * dy + dx) * CIN + c
                        T[dy, q, lane] = 1.0
    return jnp.asarray(T, jnp.bfloat16)


def pack_weights(w, b):
    """w (3,3,3,cout) -> Wp (128, 4*cout) block-diag over k, bias (4*cout).

    Row layout matches the assembled patch lanes: 12*(3dy+dx) + 3k + c.
    """
    cout = w.shape[-1]
    wp = np.zeros((128, 4 * cout), np.float32)
    wnp = np.asarray(w, np.float32)
    for k in range(4):
        for dy in range(3):
            for dx in range(3):
                for c in range(CIN):
                    row = 32 * k + (3 * dy + dx) * CIN + c
                    wp[row, k * cout:(k + 1) * cout] = wnp[dy, dx, c]
    bp = np.tile(np.asarray(b, np.float32), 4)
    return jnp.asarray(wp, jnp.bfloat16), jnp.asarray(bp, jnp.float32)


def _fused_stem_kernel(idx_ref, m_ref, f4_ref, t_ref, w_ref, b_ref,
                       out_in_ref, out_ref, win_buf, y_buf, in_sems,
                       out_sems, *, cout, nbuf=4):
    del out_in_ref
    m = m_ref[0]

    def in_copy(slot, i):
        t = idx_ref[i]
        ti = t // TILES_W
        tj = t - ti * TILES_W
        return pltpu.make_async_copy(
            f4_ref.at[pl.ds(ti * TH, WIN_R), pl.ds(tj * 128, WIN_L)],
            win_buf.at[slot], in_sems.at[slot])

    def out_copy(slot, i):
        t = idx_ref[i]
        ti = t // TILES_W
        tj = t - ti * TILES_W
        return pltpu.make_async_copy(
            y_buf.at[slot],
            out_ref.at[pl.ds(ti * TH, TH), pl.ds(tj * TW, TW), :],
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
        rt = win_buf[slot]
        acc = jnp.dot(rt[0:8], t_ref[0], preferred_element_type=jnp.float32)
        acc += jnp.dot(rt[1:9], t_ref[1], preferred_element_type=jnp.float32)
        acc += jnp.dot(rt[2:10], t_ref[2], preferred_element_type=jnp.float32)
        win = acc.astype(rt.dtype).reshape(64, 128)
        y = jnp.dot(win, w_ref[...], preferred_element_type=jnp.float32)
        y = jnp.maximum(y + b_ref[0], 0.0)

        @pl.when(i >= nbuf)
        def _():
            out_copy(slot, i - nbuf).wait()

        y_buf[slot] = y.reshape(TH, TW, cout).astype(y_buf.dtype)
        out_copy(slot, i).start()

    lax.fori_loop(0, m, body, None)

    for k in range(nbuf):
        @pl.when(m - nbuf + k >= 0)
        def _(k=k):
            j = m - nbuf + k
            out_copy(lax.rem(j, nbuf), j).wait()


def fused_stem_pallas(flat4, idx, count, T, wp, bp, out_cache):
    cout = out_cache.shape[-1]
    NBUF = 4
    kern = functools.partial(_fused_stem_kernel, cout=cout, nbuf=NBUF)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # flat4
            pl.BlockSpec(memory_space=pltpu.VMEM),             # T (3,256,1024)
            pl.BlockSpec(memory_space=pltpu.VMEM),             # Wp
            pl.BlockSpec(memory_space=pltpu.VMEM),             # bias
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # out (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, WIN_R, WIN_L), flat4.dtype),
            pltpu.VMEM((NBUF, TH, TW, cout), out_cache.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_cache.shape, out_cache.dtype),
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=2 * 64 * 128 * 512 * idx.shape[0] * 4,
            bytes_accessed=idx.shape[0] * (WIN_R * WIN_L
                                           + TH * TW * cout) * 2,
            transcendentals=0),
    )(idx, count.reshape(1), flat4, T, wp, bp.reshape(1, -1), out_cache)


def timeit(name, f, reps, *args):
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
    rng = np.random.default_rng(0)
    interior = rng.random((H, W, CIN)).astype(np.float32)
    frame = jnp.asarray(interior)
    flat4 = to_flat4(frame)
    rb = bool(jnp.all(jnp.abs(from_flat4(flat4).astype(jnp.float32)
                              - frame.astype(jnp.bfloat16).astype(
                                  jnp.float32)) == 0))
    print("flat4 round-trip exact:", rb, flush=True)

    w = jnp.asarray(rng.standard_normal((3, 3, CIN, COUT)) * 0.1,
                    jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((COUT,)) * 0.01, jnp.bfloat16)
    T = selection_mats()
    wp, bp = pack_weights(w, b)
    out_cache = jnp.zeros((g.out_h_pad, g.out_w_pad, COUT), jnp.bfloat16)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def f_fused(flat4, idx, out_cache, count):
        return fused_stem_pallas(flat4, idx, count, T, wp, bp, out_cache)

    # --- correctness: all tiles == shipped im2col m-order (bit) ---
    idx_all = jnp.arange(N_TILES, dtype=jnp.int32)
    cnt_all = jnp.asarray(N_TILES, jnp.int32)
    y_fused = f_fused(flat4, idx_all, jnp.zeros_like(out_cache), cnt_all)

    storage = dc.make_storage(g, 0.0, 0.0, jnp.bfloat16)
    storage = dc.storage_update_interior(
        storage, jnp.asarray(interior, jnp.bfloat16), g)

    @jax.jit
    def f_im2col(storage):
        def tap(dy, dx):
            return lax.slice(
                storage.astype(jnp.bfloat16), (dy, g.dx0 + dx, 0),
                (dy + g.out_h_pad, g.dx0 + dx + g.out_w_pad, CIN),
                (1, 1, 1))
        acc = dc._accumulate(tap, g.out_h_pad * g.out_w_pad, w, b, g,
                             "relu", jnp.bfloat16)
        return acc.reshape(g.out_h_pad, g.out_w_pad, COUT).astype(
            jnp.bfloat16)

    y_i2c = f_im2col(storage)
    bit = bool(jnp.all(y_fused == y_i2c))
    mx = float(jnp.max(jnp.abs(y_fused.astype(jnp.float32)
                               - y_i2c.astype(jnp.float32))))
    print(f"fused stem == im2col dense (bit): {bit} "
          f"(max abs diff {mx:.2e})", flush=True)

    @jax.jit
    def f_dense(storage):
        inter = dc.storage_interior(storage, g).astype(jnp.bfloat16)
        y = net.dense_conv(inter, w, b, spec, jnp.bfloat16)
        y = jnp.pad(y, ((0, g.out_h_pad - g.out_h),
                        (0, g.out_w_pad - g.out_w), (0, 0)))
        return y.astype(jnp.bfloat16)

    y_lax = f_dense(storage)
    mx2 = float(jnp.max(jnp.abs(y_fused.astype(jnp.float32)
                                - y_lax.astype(jnp.float32))))
    print(f"vs lax.conv dense_cached: max abs diff {mx2:.2e}", flush=True)

    # --- untouched-tile bit-identity under partial update ---
    ids = np.sort(rng.choice(N_TILES, size=N_TILES // 5,
                             replace=False)).astype(np.int32)
    sentinel = jnp.full_like(out_cache, 7.0)
    y_part = f_fused(flat4, jnp.asarray(ids), sentinel,
                     jnp.asarray(len(ids), jnp.int32))
    y_np, s_np = np.asarray(y_part), np.full((TH, TW, COUT), 7.0,
                                             np.float32)
    ok = True
    dirty = set(ids.tolist())
    for t in range(N_TILES):
        ti, tj = divmod(t, TILES_W)
        blk = y_np[ti * TH:(ti + 1) * TH, tj * TW:(tj + 1) * TW, :]
        want = (np.asarray(y_fused)[ti * TH:(ti + 1) * TH,
                                    tj * TW:(tj + 1) * TW, :]
                if t in dirty else s_np)
        if not np.array_equal(blk.astype(np.float32), want.astype(
                np.float32)):
            ok = False
            break
    print("partial update: dirty exact, untouched bit-preserved:", ok,
          flush=True)

    # --- XLA glue: to_flat4 + accept-select cost ---
    @jax.jit
    def f_glue(frame, flat4, mask):
        new4 = to_flat4(frame)
        keep = jnp.repeat(jnp.repeat(mask, TH, 0), 128, 1)
        keep = jnp.pad(keep, ((1, FH - 1 - H), (0, FL - 128 * TILES_W)),
                       constant_values=False)
        return jnp.where(keep, new4, flat4)

    mask = jnp.zeros((TILES_H, TILES_W), bool).at[::3, ::4].set(True)
    timeit("XLA glue (to_flat4 + accept select)", f_glue, 300, frame,
           flat4, mask)

    timeit("dense_cached conv (shipped)", f_dense, 300, storage)
    for frac in (0.05, 0.15, 0.30):
        m = int(N_TILES * frac)
        ids = np.sort(np.random.default_rng(1).choice(
            N_TILES, size=m, replace=False)).astype(np.int32)
        idx, cnt = jnp.asarray(ids), jnp.asarray(m, jnp.int32)
        oc = jnp.zeros_like(out_cache)
        oc = f_fused(flat4, idx, oc, cnt)
        jax.block_until_ready(oc)
        best = []
        for _round in range(3):
            t0 = time.perf_counter()
            for _ in range(300):
                oc = f_fused(flat4, idx, oc, cnt)
            jax.block_until_ready(oc)
            best.append((time.perf_counter() - t0 - 0.030) / 300 * 1e3)
        print(f"fused stem kernel @ {frac:.2f}: {min(best):.3f} ms",
              flush=True)
    oc = jnp.zeros_like(out_cache)
    oc = f_fused(flat4, idx_all, oc, cnt_all)
    jax.block_until_ready(oc)
    best = []
    for _round in range(3):
        t0 = time.perf_counter()
        for _ in range(100):
            oc = f_fused(flat4, idx_all, oc, cnt_all)
        jax.block_until_ready(oc)
        best.append((time.perf_counter() - t0 - 0.030) / 100 * 1e3)
    print(f"fused stem kernel @ 1.00: {min(best):.3f} ms", flush=True)


if __name__ == "__main__":
    main()
