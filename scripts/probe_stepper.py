"""Decompose the per-dispatch overhead of the live FrameStepper path.

LATENCY.json (r3 final): scene device_ms_pipelined 3.24 vs 0.596 scan —
the live path gives back 5.4x of the headline. Candidate causes
(VERDICT r3 next #2): per-executable launch cost of this tunneled
runtime, donated-carry handoff that scales with the carry pytree, and
the adopted pf0 MSA flag serializing dispatch staging. This probe
measures each in isolation on-chip:

  A. null-op dispatch chains: per-dispatch cost of K back-to-back async
     dispatches of a trivial jitted fn, one sync — the runtime's floor.
  B. donated-carry scaling: same, but the fn threads a donated carry of
     n_bufs x size_mb HBM buffers (scene's carry is ~60 arrays, ~1.3 GB)
     — isolates aliasing/handoff cost per dispatch.
  C. the real scene stepper at K=32 (the LATENCY.json measurement,
     reproduced) vs K-step scan executables (scan_video over K frames,
     one dispatch): K=1,2,4,8 — the micro-batch latency/throughput dial.

Run twice: with the adopted pf0 flag (default env) and with
CBINFER_TPU_NO_FLAGS=1 (tpu_env.py skips LIBTPU_INIT_ARGS) to A/B the
flag's effect on dispatch staging.

Usage: python scripts/probe_stepper.py [A|B|C|all]
Prints JSON lines; aggregate by eye or via scripts/harvest logs.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].ravel()[:1]))


def timed_chain(fn, args_fn, k=32, windows=5, sync_ms=0.0):
    """Median per-dispatch ms over `windows` chains of k async dispatches."""
    out = []
    for _ in range(windows):
        a = args_fn()
        t0 = time.perf_counter()
        for _ in range(k):
            a = fn(a)
        sync(a)
        out.append(((time.perf_counter() - t0) * 1e3 - sync_ms) / k)
    return float(np.median(out))


def probe_a(sync_ms):
    x0 = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    _ = sync(f(x0))
    ms = timed_chain(f, lambda: x0 + 0.0, sync_ms=sync_ms)
    print(json.dumps({"probe": "A_null_dispatch", "per_dispatch_ms":
                      round(ms, 4)}), flush=True)


def probe_b(sync_ms):
    # PASS-THROUGH carry: the jitted fn touches ONE tiny buffer and
    # returns the big donated buffers unchanged — isolates the per-
    # dispatch aliasing/handoff cost of a large carry pytree from any
    # compute over its bytes (the first version of this probe did `b+1`
    # on every buffer and measured its own memory traffic: 3.3 ms/GB =
    # HBM read+write, not dispatch overhead).
    for n_bufs, size_mb in ((4, 4), (16, 16), (64, 16), (64, 64)):
        n = int(size_mb * 1e6 / 2 / 128) // 8 * 8
        carry = [jnp.zeros((n, 128), jnp.bfloat16) for _ in range(n_bufs)]
        tick = jnp.zeros((8, 128), jnp.float32)

        def f(c):
            big, t = c
            return (big, t + 1.0)

        jf = jax.jit(f, donate_argnums=(0,))
        c = jf(([b + 0 for b in carry], tick + 0))
        _ = sync(c[1])
        ms = timed_chain(jf, lambda: jf(([b + 0 for b in carry],
                                         tick + 0)), sync_ms=sync_ms)
        print(json.dumps({"probe": "B_donated_carry_passthrough",
                          "n_bufs": n_bufs, "size_mb_each": size_mb,
                          "total_gb": round(n_bufs * size_mb / 1e3, 2),
                          "per_dispatch_ms": round(ms, 4)}), flush=True)


def probe_c(sync_ms):
    from cbinfer_tpu import zoo
    from cbinfer_tpu.runner import FrameStepper, scan_video
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig
    H, W = 720, 1280
    wl = zoo.load("scene", (H, W, 3))
    out_map = lambda y: jnp.argmax(y, -1).astype(jnp.uint8)  # noqa: E731
    tv = jnp.asarray(wl.taus, jnp.float32)
    video = SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=4, sprite_size=48, speed=4.0,
        noise_std=0.002, seed=int(time.time() * 1e3) % 100000))
    frames = [jnp.asarray(f) for f in video.clip(64)]
    for f in frames:
        _ = float(jnp.sum(f))

    # real stepper, K async one-frame dispatches, one sync
    stepper = FrameStepper(wl.net, wl.params, thresholds=wl.taus,
                           refresh_every=None, out_map=out_map)
    y, _ = stepper(frames[0])
    for t in range(1, 8):
        y, _ = stepper(frames[t])
    _ = np.asarray(y)
    pipe = []
    for w in range(4):
        t0 = time.perf_counter()
        for t in range(32):
            y, _ = stepper(frames[8 + ((w * 32 + t) % 48)])
        y.block_until_ready()
        pipe.append(((time.perf_counter() - t0) * 1e3 - sync_ms) / 32)
    print(json.dumps({"probe": "C_stepper_k1",
                      "per_frame_ms": round(float(np.median(pipe)), 4)}),
          flush=True)

    # K-step scan executables (micro-batch live mode). K-chunks are
    # PRE-STACKED and device-resident before timing — jnp.stack of 720p
    # frames inside the timed loop is a host-op-on-big-arrays violation
    # (~ms of tunnel serialization per call; the first run of this probe
    # measured 5.9 ms/frame at K=2 from exactly that).
    for K in (2, 4, 8):
        jf = jax.jit(
            lambda p, fs, st: scan_video(wl.net, p, fs, state=st,
                                         thresholds=tv, out_map=out_map,
                                         collect_stats=False)[:2],
            donate_argnums=(2,))
        st = wl.net.init_state()
        nwin = max(1, 32 // K)
        stacks = []
        for w in range(4):
            for i in range(nwin):
                sel = [frames[(8 + (w * nwin + i) * K + j) % 56]
                       for j in range(K)]
                stacks.append(jnp.stack(sel))
        for s in stacks:
            _ = float(jnp.sum(s[0, 0, 0]))
        ys, st = jf(wl.params, stacks[0], st)
        _ = np.asarray(ys[-1])
        ms = []
        for w in range(4):
            t0 = time.perf_counter()
            for i in range(nwin):
                ys, st = jf(wl.params, stacks[w * nwin + i], st)
            _ = float(jnp.sum(ys[-1]))
            ms.append(((time.perf_counter() - t0) * 1e3 - sync_ms)
                      / (nwin * K))
        print(json.dumps({"probe": f"C_scan_k{K}",
                          "per_frame_ms": round(float(np.median(ms)), 4)}),
              flush=True)


def probe_d(sync_ms, model="pose_graph"):
    """A/B the K=1 dispatch-floor knobs on a real workload.

    r4 decomposed the live gap into a 0.2 ms launch floor + ~17 us per
    dispatch BUFFER (probe B) but only counted the 56 carry buffers.
    The r4 stepper also returned ~6 stat scalars per CB layer as
    separate dispatch OUTPUTS (pose_graph: ~170 of them = ~2.9 ms of
    handoff per frame) and passed every weight array as a separate
    argument. This measures each knob's contribution: stats packing /
    dropping (runner.pack_stats), small-cache arena packing
    (pack_small_buffers), params bound as executable constants
    (bind_params).
    """
    from cbinfer_tpu import zoo
    from cbinfer_tpu.runner import FrameStepper
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig
    H, W = 720, 1280
    wl = zoo.load(model, (H, W, 3))
    out_map = (None if model.startswith("pose")
               else (lambda y: jnp.argmax(y, -1).astype(jnp.uint8)))
    video = SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=4, sprite_size=48, speed=4.0,
        noise_std=0.002, distinct_classes=model.startswith("pose"),
        seed=int(time.time() * 1e3) % 100000))
    frames = [jnp.asarray(f) for f in video.clip(64)]
    for f in frames:
        _ = float(jnp.sum(f))

    n_state = len(jax.tree.leaves(wl.net.init_state()))
    n_params = len(jax.tree.leaves(wl.params))
    arms = {
        "baseline": dict(collect_stats=True),   # the r4 default form
        "no_stats": dict(collect_stats=False),
        "packed_stats": dict(collect_stats="packed"),
        "no_stats+arena4mb": dict(collect_stats=False,
                                  pack_small_buffers=4 << 20),
        "no_stats+arena4mb+bound": dict(collect_stats=False,
                                        pack_small_buffers=4 << 20,
                                        bind_params=True),
        "packed+arena4mb+bound": dict(collect_stats="packed",
                                      pack_small_buffers=4 << 20,
                                      bind_params=True),
    }
    out = {"probe": "D_stepper_knobs", "model": model,
           "n_state_buffers": n_state, "n_param_buffers": n_params,
           "arms": {}}
    for arm, kw in arms.items():
        stepper = FrameStepper(wl.net, wl.params, thresholds=wl.taus,
                               refresh_every=None, out_map=out_map, **kw)
        y, _ = stepper(frames[0])
        for t in range(1, 8):
            y, _ = stepper(frames[t])
        _ = float(jnp.sum(jnp.asarray(y, jnp.float32).ravel()[:1]))
        vals = []
        for w in range(4):
            t0 = time.perf_counter()
            for t in range(32):
                y, _ = stepper(frames[8 + ((w * 32 + t) % 48)])
            _ = float(jnp.sum(jnp.asarray(y, jnp.float32).ravel()[:1]))
            vals.append(((time.perf_counter() - t0) * 1e3 - sync_ms) / 32)
        ms = float(np.median(vals))
        out["arms"][arm] = {"per_frame_ms": round(ms, 4),
                            "n_packed": stepper._n_packed}
        print(json.dumps({"probe": "D", "model": model, "arm": arm,
                          "per_frame_ms": round(ms, 4),
                          "n_packed": stepper._n_packed}), flush=True)
    with open(f"/root/repo/PROBE_stepper_{model}.json", "w") as f:
        json.dump(out, f, indent=1)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    from cbinfer_tpu.benchmark import devices_or_die, measure_sync_overhead
    if not any(d.platform == "tpu" for d in devices_or_die()):
        print(json.dumps({"error": "not on TPU"}))
        return 1
    sync_ms = measure_sync_overhead() * 1e3
    print(json.dumps({"sync_overhead_ms": round(sync_ms, 3),
                      "libtpu_init_args":
                      os.environ.get("LIBTPU_INIT_ARGS", "")}), flush=True)
    if which in ("A", "all"):
        probe_a(sync_ms)
    if which in ("B", "all"):
        probe_b(sync_ms)
    if which in ("C", "all"):
        probe_c(sync_ms)
    if which in ("D", "all"):
        probe_d(sync_ms, sys.argv[2] if len(sys.argv) > 2 else "pose_graph")
    return 0


if __name__ == "__main__":
    sys.exit(main())
