"""Perf experiments: stem policy and tile-size variants at 720p (C16/§7).

Times the CB scan of the scene CNN under named configuration variants on
identical clips, printing ms/frame for each — the measurement behind the
optimization-ledger entries in RESULTS.md. Variants:

  stem=dense         plain dense stem (no hint; L1 does full-map detect)
  stem=dense_cached  stem detects on its 3-ch input + dense conv from the
                     accepted cache, emitting a dirty hint so L1 detects
                     sparsely (r1 measured this SLOWER pre-im2col; rematch)
  stem=band_cached   row-band sparse stem at several capacities
  stem=jnp cap=F     8x8-tile XLA sparse stem (the measured negative)
  out=...            output stacking form: logits vs uint8 argmax maps,
                     CB and dense sides (runner.scan_video out_map)
  tile=HxW           conv/pool tile size sweep (VERDICT r1 item 8)

Usage: python scripts/exp_variants.py [stem|sparse|out|out_dense|tile|all]
(out_dense = just the dense-baseline output-form rows; results merge into
EXP_variants.json rather than overwriting it)
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


def main():
    from cbinfer_tpu.config import PipelineConfig, TileConfig
    from cbinfer_tpu.convert import convert, num_cb_layers
    from cbinfer_tpu.models import get_model
    from cbinfer_tpu.runner import scan_video
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig
    import bench as _bench

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    H, W, T, CHUNKS = 720, 1280, 32, 2
    from cbinfer_tpu.benchmark import devices_or_die  # bounded: tunnel can hang
    on_tpu = any(d.platform == "tpu" for d in devices_or_die())
    backend = "pallas" if on_tpu else "jnp"
    specs = get_model("scene", num_classes=8, width=128)
    params, wsrc = _bench._load_params(specs, (H, W, 3))

    video = SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=4, sprite_size=48, speed=4.0,
        noise_std=0.002, seed=0))
    chunks = [jnp.asarray(video.clip(T)) for _ in range(CHUNKS)]
    for ch in chunks:
        _ = float(jnp.sum(ch))

    from cbinfer_tpu.benchmark import measure_sync_overhead
    sync_overhead = measure_sync_overhead()

    def cfg_for(tile_h=8, tile_w=8, capacity=0.375):
        return PipelineConfig(
            tile=TileConfig(tile_h=tile_h, tile_w=tile_w,
                            capacity_fraction=capacity),
            backend=backend,
            compute_dtype="bfloat16" if on_tpu else "float32",
            cache_dtype="bfloat16" if on_tpu else "float32")

    def run(name, net, out_map=None):
        taus = [0.15] * num_cb_layers(net.specs)  # the tuned operating point
        tv = jnp.asarray(taus, jnp.float32)
        cb = jax.jit(lambda p, fs, st: scan_video(net, p, fs, state=st,
                                                  thresholds=tv,
                                                  collect_stats=False,
                                                  out_map=out_map)[:2],
                     donate_argnums=(2,))
        ys, st = cb(params, chunks[0], net.init_state())
        _ = float(jnp.sum(jax.tree.leaves(ys)[0][-1]))
        best = float("inf")
        for _rep in range(2):
            t0 = time.perf_counter()
            for ch in chunks:
                ys, st = cb(params, ch, st)
            _ = float(jnp.sum(jax.tree.leaves(ys)[0][-1]))
            best = min(best, time.perf_counter() - t0 - sync_overhead)
        ms = 1e3 * best / (CHUNKS * T)
        print(f"{name:<28} {ms:7.3f} ms/frame  "
              f"({CHUNKS * T / best:7.1f} fps)", flush=True)
        return ms

    results = {}
    if which in ("stem", "all"):
        results["stem=dense"] = run(
            "stem=dense (r1 policy)",
            convert(specs, (H, W, 3), cfg_for(), dense_layers=[0]))
        results["stem=dense_cached"] = run(
            "stem=dense_cached (hinted)",
            convert(specs, (H, W, 3), cfg_for(),
                    backend_overrides={0: "dense_cached"}))
        results["stem=cb_banded"] = run(
            "stem=cb_banded (fused sparse)",
            convert(specs, (H, W, 3), cfg_for()))
        # full-width ROW-BAND sparse stem (layers.py band_cached): detect
        # like dense_cached, but recompute only dirty 8-row output bands
        # — contiguous gathers/one batched im2col matmul/row scatter.
        # Sweeps capacity: smaller = bigger steady-state win, more
        # overflow (cond->dense) exposure.
        for cap in (0.25, 0.375, 0.5):
            results[f"stem=band_cached cap={cap}"] = run(
                f"stem=band_cached cap={cap}",
                convert(specs, (H, W, 3), cfg_for(capacity=cap),
                        backend_overrides={0: "band_cached"}))
    if which in ("sparse", "all"):
        # XLA sparse-write stem: gather/im2col/matmul/in-place scatter at a
        # fixed tile capacity (global capacity applies only to jnp layers =
        # the stem; pallas layers are count-bounded). The dense_cached stem
        # writes its full 236 MB output map every frame even when <5% of
        # tiles changed — a sparse scatter writes only changed tiles.
        for cap in (0.10, 0.15, 0.25):
            results[f"stem=jnp cap={cap}"] = run(
                f"stem=jnp_sparse cap={cap}",
                convert(specs, (H, W, 3), cfg_for(capacity=cap),
                        backend_overrides={0: "jnp"}))
        results["stem=jnp cap=0.15 + dense classifier"] = run(
            "stem=jnp_sparse + dense 1x1",
            convert(specs, (H, W, 3), cfg_for(capacity=0.15),
                    backend_overrides={0: "jnp"},
                    dense_layers=[len(specs) - 1]))
        results["stem=dense_cached + dense classifier"] = run(
            "stem=dense_cached + dense 1x1",
            convert(specs, (H, W, 3), cfg_for(),
                    backend_overrides={0: "dense_cached"},
                    dense_layers=[len(specs) - 1]))
    if which in ("out", "all"):
        # per-frame output form: stacking 8-ch bf16 logits over T is
        # lane-padded 16x by TPU layouts; a deployment loop that consumes
        # class maps can stack uint8 argmax instead (runner.scan_video
        # out_map doc; same argmax-transparency as the seg harness)
        from cbinfer_tpu.convert import convert_flagship as _cf
        results["out=logits"] = run("out=logits (flagship)",
                                    _cf(specs, (H, W, 3), cfg_for()))
        results["out=argmax_u8"] = run(
            "out=argmax_u8 (flagship)",
            _cf(specs, (H, W, 3), cfg_for()),
            out_map=lambda y: jnp.argmax(y, -1).astype(jnp.uint8))
    if which in ("out", "out_dense", "all"):
        # the DENSE baseline must get the same output form for a fair
        # speedup ratio (its logits stack pays the same 16x lane pad).
        # ``out_dense`` runs ONLY this half — the first queue run of
        # ``out`` timed out after the CB rows, and a fair argmax-vs-argmax
        # headline needs the dense twin without re-paying the CB compiles.
        from cbinfer_tpu.convert import convert_flagship as _cf
        net_d = _cf(specs, (H, W, 3), cfg_for())

        def run_dense(name, out_map=None):
            # the dense net is STATELESS, so repeated dispatches on the
            # same chunk are identical (executable, args) pairs and the
            # runtime serves them from its dispatch-memoization cache
            # (benchmark.py 'r2 bug': dense measured 275->377 fake fps).
            # Every timed dispatch gets a DISTINCT fresh clip; the CB
            # run() above is immune via its donated distinct state.
            f = (lambda x: x) if out_map is None else out_map
            dense = jax.jit(lambda p, fs: jax.lax.map(
                lambda x: f(net_d.apply_dense(p, x)), fs))
            fresh = [jnp.asarray(video.clip(T))
                     for _ in range(2 * CHUNKS + 1)]
            for ch in fresh:
                _ = float(jnp.sum(ch))
            ys = dense(params, fresh[0])
            _ = float(jnp.sum(ys[-1].astype(jnp.float32)))
            best = float("inf")
            for rep in range(2):
                timed = fresh[1 + rep * CHUNKS:1 + (rep + 1) * CHUNKS]
                t0 = time.perf_counter()
                for ch in timed:
                    ys = dense(params, ch)
                _ = float(jnp.sum(ys[-1].astype(jnp.float32)))
                best = min(best, time.perf_counter() - t0 - sync_overhead)
            ms = 1e3 * best / (CHUNKS * T)
            print(f"{name:<28} {ms:7.3f} ms/frame "
                  f"({CHUNKS * T / best:7.1f} fps)", flush=True)
            return ms

        results["out=dense_logits"] = run_dense("out=dense logits")
        results["out=dense_argmax_u8"] = run_dense(
            "out=dense argmax_u8",
            out_map=lambda y: jnp.argmax(y, -1).astype(jnp.uint8))
    if which in ("tile", "all"):
        # flagship construction at each compute-tile size; wider tiles cut
        # the sparse kernels' serial iteration counts (tiny 8x8x128 DMAs
        # are launch-bound) at the cost of coarser recompute masks
        from cbinfer_tpu.convert import convert_flagship
        for th, tw in ((8, 8), (8, 16), (8, 32), (16, 16), (16, 32)):
            results[f"tile={th}x{tw}"] = run(
                f"tile={th}x{tw} (flagship)",
                convert_flagship(specs, (H, W, 3), cfg_for(th, tw)))
    # merge, don't overwrite: each mode contributes its rows and a step
    # that times out mid-mode must not erase earlier modes' measurements
    path = "/root/repo/EXP_variants.json"
    merged = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                merged = json.load(f).get("ms_per_frame", {})
        except Exception:
            merged = {}
    merged.update(results)
    with open(path, "w") as f:
        json.dump({"weights": wsrc, "ms_per_frame": merged}, f, indent=2)
    print("wrote EXP_variants.json")


if __name__ == "__main__":
    sys.exit(main())
