"""On-chip micro-probe: per-frame to_flat4 ingest variants (r4).

The shipped classic form pays ~48 us/frame converting the incoming
(720, 1280, 3) f32 frame to the flat4 (fh, fl) bf16 layout inside the
scan body (xprof: pad 22 + reshape-copy 25.6), against a ~23 us
read+write floor. Variants measured as T-frame scans (each step
converts frames[t] and accumulates a scalar so nothing DCEs; distinct
clips per rep so nothing memoizes; scalar-fetch sync; sync overhead
subtracted):

  v0_current      pad(astype(bf16), rank-3) -> reshape   (ops/flat4.py)
  v1_concat2d     concat zero channel -> astype -> reshape(h,4w) ->
                  rank-2 pad
  v2_pad3_first   pad channels f32 -> reshape(h,4w) f32 -> astype+pad
                  rank-2
  v3_slice_fused  v0 but from clip[t] via explicit lax.dynamic_slice
                  inside the same jit (does XLA fuse the scan slice?)
  v4_dus_carry    (r5) margins live in a buffer THREADED THROUGH THE
                  SCAN CARRY (they are constant zeros — why rewrite
                  them every frame?); per frame only the (h, 4w)
                  interior is dynamic_update_slice'd in place. If XLA
                  fuses the concat+cast producer into the DUS this is
                  ONE read + ONE interior write = the floor.
  v5_dus_fresh    (r5) same DUS but into fresh jnp.zeros each frame —
                  isolates what the carried margins buy vs the zeros
                  materialization.

Usage: python scripts/probe_flat4_ingest.py [reps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_enable_compilation_cache", False)

H, W, CIN, CP = 720, 1280, 3, 4
T = 64   # overridable: argv[2] (post-wedge tunnel jitter can exceed a
         # 64-frame window's ~2.6 ms of signal — use T=256 then)


def geom():
    from cbinfer_tpu.ops.flat4 import flat4_geom
    return flat4_geom(H, W, CIN)


def v0_current(x, fg):
    from cbinfer_tpu.ops.flat4 import to_flat4
    return to_flat4(x, fg, jnp.bfloat16)


def v1_concat2d(x, fg):
    f = jnp.concatenate(
        [x, jnp.zeros((H, W, CP - CIN), x.dtype)], axis=-1)
    f = f.astype(jnp.bfloat16).reshape(H, CP * W)
    return jnp.pad(f, ((1, fg.fh - H - 1), (CP, fg.fl - CP * W - CP)))


def v2_pad3_first(x, fg):
    f = jnp.pad(x, ((0, 0), (0, 0), (0, CP - CIN))).reshape(H, CP * W)
    f = f.astype(jnp.bfloat16)
    return jnp.pad(f, ((1, fg.fh - H - 1), (CP, fg.fl - CP * W - CP)))


def main():
    global T
    from cbinfer_tpu.benchmark import devices_or_die, measure_sync_overhead
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    if len(sys.argv) > 2:
        T = int(sys.argv[2])
    if not any(d.platform == "tpu" for d in devices_or_die()):
        print(json.dumps({"error": "not on TPU"}))
        return 1
    sync_ms = measure_sync_overhead() * 1e3
    fg = geom()

    def make_scan(fn, sliced):
        # The conversion must MATERIALIZE: in the pipeline f4 feeds a
        # Pallas custom call (unfusable). A bare row-sum consumer let XLA
        # fuse the whole conversion into the sum of one row (first run
        # of this probe measured ~0 us/frame — classic microbench DCE);
        # optimization_barrier reproduces the custom-call boundary.
        def body(x, acc):
            f4 = lax.optimization_barrier(fn(x, fg))
            return acc + jnp.sum(f4[8].astype(jnp.float32))

        if sliced:
            def run(clip, ts):
                def step(acc, t):
                    x = lax.dynamic_slice(
                        clip, (t, 0, 0, 0), (1, H, W, CIN))[0]
                    return body(x, acc), ()
                return lax.scan(step, jnp.float32(0), ts)[0]
            return jax.jit(run)

        def run(frames):
            def step(acc, x):
                return body(x, acc), ()
            return lax.scan(step, jnp.float32(0), frames)[0]
        return jax.jit(run)

    def interior2d(x):
        f = jnp.concatenate(
            [x, jnp.zeros((H, W, CP - CIN), x.dtype)], axis=-1)
        return f.astype(jnp.bfloat16).reshape(H, CP * W)

    def make_dus_scan(carry_buf):
        def step(carry, x):
            acc, buf = carry
            buf2 = lax.dynamic_update_slice(buf, interior2d(x), (1, CP))
            buf2 = lax.optimization_barrier(buf2)
            return (acc + jnp.sum(buf2[8].astype(jnp.float32)),
                    (buf2 if carry_buf
                     else jnp.zeros((fg.fh, fg.fl), jnp.bfloat16))), ()

        def run(frames):
            buf0 = jnp.zeros((fg.fh, fg.fl), jnp.bfloat16)
            return lax.scan(step, (jnp.float32(0), buf0), frames)[0][0]
        return jax.jit(run)

    rng = np.random.default_rng(0)

    def fresh_clip():
        return jnp.asarray(rng.random((T, H, W, CIN), np.float32))

    out = {}
    variants = {"v0_current": (v0_current, False),
                "v1_concat2d": (v1_concat2d, False),
                "v2_pad3_first": (v2_pad3_first, False),
                "v3_slice_fused": (v0_current, True),
                "v4_dus_carry": ("dus", True),
                "v5_dus_fresh": ("dus", False)}
    for name, (fn, sliced) in variants.items():
        if fn == "dus":
            run = make_dus_scan(carry_buf=sliced)
            sliced = False
        else:
            run = make_scan(fn, sliced)
        ts = jnp.arange(T, dtype=jnp.int32)
        c = fresh_clip()
        _ = float(run(c, ts) if sliced else run(c))  # compile + warm
        vals = []
        for r in range(reps):
            c = fresh_clip()
            _ = float(jnp.sum(c[0, 0, 0]))  # device-resident
            t0 = time.perf_counter()
            acc = run(c, ts) if sliced else run(c)
            _ = float(acc)
            vals.append(((time.perf_counter() - t0) * 1e3 - sync_ms) / T)
        out[name] = round(float(np.median(vals)), 4)
        print(json.dumps({name: out[name]}), flush=True)
    out["floor_note"] = ("read 11 MB f32 + write 7.6 MB bf16 ~= 23 us "
                        "at 800 GB/s")
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
