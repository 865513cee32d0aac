"""Micro-probe: which DMA slice shapes does Mosaic accept on this chip?

The persistent packed-patch stem (probe_patch_stem.py follow-up) needs,
per dirty tile, DMA writes into the persistent P buffer (rows, groups,
128 lanes) of the form

    P[r0 : r0+8, 8*tj : 8*tj+16, 36*dy : 36*dy+36]  <- VMEM (8, 16, 36)

i.e. arbitrary row offset, 8-aligned group offset/extent, and a NARROW
UNALIGNED lane slice (offset in {0, 36, 72}, width 36).  Each pattern
below is tried in its own pallas_call; a Mosaic rejection surfaces as a
compile-time exception we catch and report, and accepted patterns are
verified value-exactly against numpy.
"""
import functools
import sys
import os
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

R, G, L = 64, 48, 128


def run_case(name, write_slice, vshape, row0, g0, l0):
    """One pallas_call that writes iota into dst[write_slice]."""
    def kernel(dst_in_ref, dst_ref, buf, sem_w):
        lane_iota = lax.broadcasted_iota(
            jnp.float32, buf.shape, len(buf.shape) - 1)
        buf[...] = (lane_iota + 1.0).astype(jnp.bfloat16)
        cp = pltpu.make_async_copy(
            buf, dst_ref.at[write_slice], sem_w)
        cp.start()
        cp.wait()

    dst = jnp.zeros((R, G, L), jnp.bfloat16)
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            out_shape=jax.ShapeDtypeStruct(dst.shape, dst.dtype),
            input_output_aliases={0: 0},
            scratch_shapes=[
                pltpu.VMEM(vshape, jnp.bfloat16),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(dst)
        out = np.asarray(out)
        want = np.zeros((R, G, L), np.float32)
        iota = (np.arange(vshape[-1], dtype=np.float32) + 1.0)
        want[row0:row0 + vshape[0], g0:g0 + vshape[1],
             l0:l0 + vshape[2]] = iota[None, None, :]
        ok = np.array_equal(out.astype(np.float32), want)
        print(f"{name}: COMPILED, values {'OK' if ok else 'WRONG'}",
              flush=True)
        return ok
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: REJECTED ({type(e).__name__}: {msg})", flush=True)
        return False


def run_case_read(name, src_shape, read_slice, vshape):
    """Read src[read_slice] into VMEM, write it to a dense output."""
    def kernel(src_ref, out_ref, buf, sem_r, sem_w):
        cp = pltpu.make_async_copy(src_ref.at[read_slice], buf, sem_r)
        cp.start()
        cp.wait()
        cp2 = pltpu.make_async_copy(buf, out_ref, sem_w)
        cp2.start()
        cp2.wait()

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.random(src_shape), jnp.bfloat16)
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            out_shape=jax.ShapeDtypeStruct(vshape, jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM(vshape, jnp.bfloat16),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        )(src)
        want = np.asarray(src)[tuple(read_slice)]
        ok = np.array_equal(np.asarray(out), want)
        print(f"{name}: COMPILED, values {'OK' if ok else 'WRONG'}",
              flush=True)
        return ok
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: REJECTED ({type(e).__name__}: {msg})", flush=True)
        return False


def main():
    ds = pl.ds
    # 1. Full-lane, aligned everything (sanity).
    run_case("w1 full-lane aligned (8,16,128)@(8,16,0)",
             (ds(8, 8), ds(16, 16), slice(None)), (8, 16, 128), 8, 16, 0)
    # 2. Narrow unaligned lane slice — THE pattern the P-update needs.
    run_case("w2 narrow lanes (8,16,36)@(5,16,36)",
             (ds(5, 8), ds(16, 16), ds(36, 36)), (8, 16, 36), 5, 16, 36)
    # 3. Narrow lane at offset 72.
    run_case("w3 narrow lanes (8,16,36)@(3,8,72)",
             (ds(3, 8), ds(8, 16), ds(72, 36)), (8, 16, 36), 3, 8, 72)
    # 4. Unaligned group offset, extent 9.
    run_case("w4 group extent 9 (8,9,128)@(8,7,0)",
             (ds(8, 8), ds(7, 9), slice(None)), (8, 9, 128), 8, 7, 0)
    # 5. Narrow lane AND odd group extent.
    run_case("w5 (8,9,36)@(1,7,36)",
             (ds(1, 8), ds(7, 9), ds(36, 36)), (8, 9, 36), 1, 7, 36)
    # 6. Lane offset 64 width 64 (half-aligned).
    run_case("w6 (8,16,64)@(8,16,64)",
             (ds(8, 8), ds(16, 16), ds(64, 64)), (8, 16, 64), 8, 16, 64)
    # 7a. 2D read fully aligned (sanity).
    run_case_read("r0 flat read (8,384)@(16,128) of (720,5504)",
                  (720, 5504), (ds(16, 8), ds(128, 384)), (8, 384))
    # 7b. 2D flat read at 128-mult lane offset, odd row (update input).
    run_case_read("r1 flat read (8,384)@(17,128) of (720,5504)",
                  (720, 5504), (ds(17, 8), ds(128, 384)), (8, 384))
    # 8. 2D flat read at NON-128 offset (would simplify padding).
    run_case_read("r2 flat read (8,384)@(17,96) of (720,5504)",
                  (720, 5504), (ds(17, 8), ds(96, 384)), (8, 384))
    # 9. 3D read, group offset unaligned extent 9 (conv-side halo read).
    run_case_read("r3 3D read (8,9,128)@(9,15,0) of (64,48,128)",
                  (R, G, L), (ds(9, 8), ds(15, 9), slice(None)),
                  (8, 9, 128))
    # 10. 2D read, non-8-mult row count from odd width array.
    run_case_read("r4 flat read (10,256)@(3,256) of (722,5444)",
                  (722, 5444), (ds(3, 10), ds(256, 256)), (10, 256))


if __name__ == "__main__":
    main()
