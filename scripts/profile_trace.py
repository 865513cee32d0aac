"""Per-STAGE wall-clock attribution from an on-chip xprof trace (C20,
VERDICT r2 missing #6).

The reference papers publish per-stage breakdowns (change detection /
propagation / gather / GEMM / scatter — arXiv 1704.04313 §4). Layer-prefix
deltas (scripts/profile_stages.py) attribute per LAYER; this script
attributes per STAGE: it runs the flagship CB scan under ``jax.profiler``
and aggregates device-op durations from the trace by kernel name — the
Pallas kernels are named (_sparse_kernel / _band_kernel = detection,
_delta_conv_kernel = gather+GEMM+scatter, _delta_pool_kernel /
_fused_pool_kernel = pooling); everything else is XLA glue (compaction,
dense_cached stem conv, refresh).

Writes a ``stages`` section into PROFILE.json (merged, layer rows kept).

Usage: python scripts/profile_trace.py [model] [width]
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# NO persistent compilation cache here: its key strips HLO metadata, so a
# metadata-only change (named scopes, source lines) silently serves a stale
# executable whose as_text()/trace op_names lack the new attribution.
jax.config.update("jax_enable_compilation_cache", False)

STAGE_OF = [
    ("_sparse_kernel", "detect"),
    ("_band_kernel", "detect"),
    ("_delta_conv_kernel", "delta_conv"),
    ("_delta_pool_kernel", "delta_pool"),
    ("_fused_pool_kernel", "fused_pool"),
]


def classify(name: str) -> str:
    for pat, stage in STAGE_OF:
        if pat in name:
            return stage
    # named-scope pallas_call events carry the layer scope as the op name
    # (e.g. "L1_pool.8", "patch_conv.8", "delta_kernel.24")
    if "_pool" in name:
        return "delta_pool"
    if "patch_conv" in name:
        return "delta_conv"
    if "delta_kernel" in name:
        return "delta_conv"
    if "fusion" in name or "convolution" in name or "dot" in name:
        return "xla_compute"
    return "xla_other"


def collect_trace_events(logdir):
    """Device-op (name, ts_us, dur_us, pid, tid) out of a jax.profiler
    trace (perfetto/trace-viewer json under plugins/profile/*/)."""
    evs = []
    for f in glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                       recursive=True):
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        # pid -> process name from metadata events, so host python/TSL
        # lanes (np.asarray, stop_trace, ...) never pollute device totals;
        # tid -> thread name, because the device pid carries BOTH an
        # "XLA Ops" lane and an "XLA Modules" lane (whole-executable
        # spans on a SEPARATE track — cross-track nesting can't be
        # subtracted, so including Modules would re-add the entire scan
        # as unattributed 'xla_other': measured 487 us/frame of phantom
        # glue before this filter, r4)
        pname, tname = {}, {}
        for e in data.get("traceEvents", []):
            if e.get("ph") != "M":
                continue
            if e.get("name") == "process_name":
                pname[e.get("pid")] = e.get("args", {}).get("name", "")
            elif e.get("name") == "thread_name":
                tname[(e.get("pid"), e.get("tid"))] = \
                    e.get("args", {}).get("name", "")
        dev_pids = {pid for pid, nm in pname.items()
                    if "TPU" in nm or "device" in nm.lower()}
        for e in data.get("traceEvents", []):
            if e.get("ph") == "X" and "dur" in e:
                if dev_pids and e.get("pid") not in dev_pids:
                    continue
                if "Modules" in tname.get((e.get("pid"), e.get("tid")),
                                          ""):
                    continue
                evs.append((e.get("name", ""), float(e.get("ts", 0.0)),
                            float(e["dur"]), e.get("pid"), e.get("tid")))
    return evs


def self_times(evs):
    """(name, self_dur_us) with nested children subtracted.

    Trace lanes nest wrapper ops (the ``while.N`` scan body, fusion
    parents) AROUND their children on the same (pid, tid) track, so
    summing raw durations double-counts every nested child against its
    parent (r3: 1.37 ms of attributed stage time on a measured 0.6 ms
    frame). Standard flame-graph self-time fixes it: per track, sort by
    (ts, -dur) and subtract each event's directly-nested children from
    its own duration. Self time of a wrapper is then genuinely its own
    (loop bookkeeping, inter-op gaps are NOT included — only time inside
    the wrapper not covered by a child event), and stage sums become
    additive: sum(self) == sum(top-level durations)."""
    from collections import defaultdict
    tracks = defaultdict(list)
    for nm, ts, dur, pid, tid in evs:
        tracks[(pid, tid)].append((ts, dur, nm))
    out = []

    def finish(fin, stack):
        end, dur, nm, child = fin
        out.append((nm, max(0.0, dur - child)))
        if stack:
            stack[-1][3] += dur

    for tr in tracks.values():
        tr.sort(key=lambda e: (e[0], -e[1]))
        stack = []  # [end, dur, name, child_dur_sum]
        for ts, dur, nm in tr:
            while stack and ts >= stack[-1][0] - 1e-6:
                finish(stack.pop(), stack)
            stack.append([ts + dur, dur, nm, 0.0])
        while stack:
            finish(stack.pop(), stack)
    return out


def parse_hlo_metadata(hlo_text: str):
    """One pass over the optimized HLO: instruction name ->
    ("source_file:line  op_name" attribution, definition line).

    The trace's device-op names are the optimized-HLO instruction names
    (modulo '-' vs '_'), so joining against the compiled module's metadata
    pins each anonymous ``fusion.N`` / ``dynamic-update-slice.N`` glue op
    to the jaxpr op_name and the cbinfer_tpu source line that emitted it.
    Scheduler glue (``copy.N`` / ``pad.N`` / ``copy-done.N``) carries NO
    source metadata — it is inserted by layout/memory passes, not by a
    jaxpr op — so for those the DEFINITION (shape + opcode + operands,
    truncated) is kept as the fallback: it names the buffer a
    80 us/frame copy is moving (r3: how the MSA staging copies were
    pinned to the pool caches)."""
    import re
    attr, defs = {}, {}
    inst_re = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.-]+)\s*=\s*(.*)$")
    for line in hlo_text.splitlines():
        m = inst_re.match(line)
        if not m:
            continue
        name = m.group(1).replace("-", "_")
        # strip metadata/backend_config tails; keep shape+opcode+operands
        body = m.group(2)
        defs[name] = body.split(", metadata={")[0] \
                         .split(", backend_config=")[0][:160]
        if "metadata={" not in line:
            continue
        op = re.search(r'op_name="([^"]*)"', line)
        sf = re.search(r'source_file="([^"]*)"', line)
        sl = re.search(r"source_line=(\d+)", line)
        parts = []
        if sf:
            parts.append(sf.group(1).replace("/root/repo/", "")
                         + (f":{sl.group(1)}" if sl else ""))
        if op:
            # keep the tail of the jaxpr path — the leading jit/while
            # scaffolding is identical for every op in the scan body
            parts.append(op.group(1)[-80:])
        if parts:
            attr[name] = "  ".join(parts)
    return attr, defs


def main():
    from cbinfer_tpu.config import PipelineConfig, TileConfig, UpsampleSpec
    from cbinfer_tpu.convert import convert_flagship, num_cb_layers
    from cbinfer_tpu.checkpoint import load_npz_params, load_thresholds
    from cbinfer_tpu.models import get_model
    from cbinfer_tpu.network import init_params
    from cbinfer_tpu.runner import scan_video
    from cbinfer_tpu.video import SpriteVideo, SpriteVideoConfig

    name = sys.argv[1] if len(sys.argv) > 1 else "scene"
    width = int(sys.argv[2]) if len(sys.argv) > 2 else (
        128 if name == "scene" else 64)
    H, W, T = (720, 1280, 12) if name.startswith("pose") else (720, 1280, 24)
    if os.environ.get("CBINFER_TRACE_SHAPE"):  # CPU smoke: "H,W,T"
        H, W, T = map(int, os.environ["CBINFER_TRACE_SHAPE"].split(","))
    from cbinfer_tpu.benchmark import devices_or_die  # bounded: tunnel can hang
    on_tpu = any(d.platform == "tpu" for d in devices_or_die())
    cfg = PipelineConfig(
        tile=TileConfig(8, 8), backend="pallas" if on_tpu else "jnp",
        compute_dtype="bfloat16" if on_tpu else "float32",
        cache_dtype="bfloat16" if on_tpu else "float32")
    if name == "pose_graph":
        # the DAG workload has its own converter/policy — one-call zoo
        # build, same construction as bench_pose_graph.py
        from cbinfer_tpu import zoo
        wl = zoo.load(name, (H, W, 3), cfg)
        for wmsg in wl.warnings:
            print(f"WARNING: {wmsg}", file=sys.stderr)
        net, params = wl.net, wl.params
        taus = jnp.asarray(wl.taus, jnp.float32)
    else:
        specs = (get_model(name, width=width) if name == "pose"
                 else get_model(name, num_classes=8, width=width))
        if isinstance(specs[-1], UpsampleSpec):
            specs = specs[:-1]
        net = convert_flagship(specs, (H, W, 3), cfg)
        params = init_params(specs, (H, W, 3), jax.random.PRNGKey(0))
        try:
            params = load_npz_params(f"/root/repo/ckpts/{name}_w{width}.npz",
                                     params)
        except Exception as e:
            print(f"WARNING random weights ({e})", file=sys.stderr)
        n_cb = num_cb_layers(net.specs)
        try:
            taus = jnp.asarray(load_thresholds(
                f"/root/repo/ckpts/{name}_w{width}_tau.json"), jnp.float32)
            assert taus.shape[0] == n_cb
        except Exception:
            taus = jnp.full((n_cb,), 0.04, jnp.float32)

    video = SpriteVideo(SpriteVideoConfig(
        height=H, width=W, n_sprites=4, sprite_size=max(24, H // 15),
        speed=4.0, noise_std=0.002, seed=33))
    warm = jnp.asarray(video.clip(T))
    clip = jnp.asarray(video.clip(T))
    _ = float(jnp.sum(warm)) + float(jnp.sum(clip))

    # profile the SHIPPED output form (bench.py): per-frame argmax u8
    # class maps for miou models (the logits stack is lane-padded 16x and
    # its DUS would dominate the glue profile with a cost the headline
    # no longer pays); pose keeps raw heatmaps (its consumers need them)
    out_u8 = (None if name.startswith("pose")
              else (lambda y: jnp.argmax(y, -1).astype(jnp.uint8)))
    # CBINFER_TRACE_STATS=stack|mean|none: A/B the observability forms —
    # the per-frame s32[T] copy-done (~75 us/frame in the r3 traces) is
    # the stacked per-layer counters serializing in the scan body; "mean"
    # is the carry-accumulated deployment form bench.py ships
    smode = os.environ.get("CBINFER_TRACE_STATS", "stack")
    collect = {"stack": True, "mean": "mean", "none": False}[smode]
    # CBINFER_TRACE_INGEST=1: clip-resident Flat4Clip form (what bench.py
    # ships); default 0 keeps the classic per-frame xs for A/B
    ing = os.environ.get("CBINFER_TRACE_INGEST", "0") == "1"
    jstep = jax.jit(
        lambda p, fs, st, tv: scan_video(net, p, fs, state=st,
                                         thresholds=tv, out_map=out_u8,
                                         collect_stats=collect,
                                         ingest=ing),
        donate_argnums=(2,))
    st0 = net.init_state()
    # AOT-compile ONCE and execute the same object: a separate
    # lower().compile() just for as_text() would not populate the jit
    # dispatch cache (and the persistent cache is off here — see above),
    # doubling a ~1-2 min 720p compile; executing the AOT executable also
    # guarantees the traced op names match hlo_attr exactly.
    absargs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        (params, warm, st0, taus))
    step = jstep.lower(*absargs).compile()
    hlo_attr, hlo_defs = {}, {}
    try:
        hlo_attr, hlo_defs = parse_hlo_metadata(step.as_text())
        print(f"{len(hlo_attr)} HLO instructions with source metadata")
    except Exception as e:  # attribution is best-effort; keep the timings
        print(f"WARNING hlo attribution failed: {e}", file=sys.stderr)
    ys, st, _ = step(params, warm, st0, taus)
    _ = float(jnp.sum(ys[-1, :, 0]))

    logdir = "/tmp/cbinfer_trace"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    ys, st, _ = step(params, clip, st, taus)
    _ = float(jnp.sum(ys[-1, :, 0]))
    jax.profiler.stop_trace()

    evs = collect_trace_events(logdir)
    print(f"{len(evs)} trace events")

    def classify_attr(nm: str) -> str:
        """Stage from the HLO op_name scopes (layers.py named_scope) when
        available — bins the anonymous XLA glue (pads/copies/DUS) under
        the stage that emitted it instead of 'xla_other'."""
        a = hlo_attr.get(nm.replace("-", "_").split(":")[-1].strip(), "")
        for scope, stage in (("/detect/", "detect"),
                             ("/accept_hinted/", "detect"),
                             ("/compact/", "compact"),
                             ("/delta_kernel/", "delta_conv"),
                             ("/patch_conv/", "delta_conv"),
                             ("_pool/", "delta_pool"),
                             ("/band_conv/", "band_conv"),
                             ("/cached_conv/", "cached_conv"),
                             ("/out_pad/", "cached_conv")):
            if scope in a or a.endswith(scope.rstrip("/")):
                return stage
        return classify(nm)

    # aggregate SELF time by stage (children subtracted — see self_times),
    # so the per-frame stage sums are additive and match the measured
    # frame; also keep the top raw names for inspection. The while/scan
    # wrapper's own self time is binned as loop_overhead, not glue.
    by_stage, by_name = {}, {}
    for nm, dur in self_times(evs):
        st_ = ("loop_overhead" if nm.split(".")[0] in ("while", "body",
                                                       "condition")
               else classify_attr(nm))
        by_stage[st_] = by_stage.get(st_, 0.0) + dur
        by_name[nm] = by_name.get(nm, 0.0) + dur
    def attribution(nm):
        key = nm.replace("-", "_").split(":")[-1].strip()
        a = hlo_attr.get(key, "")
        if not a:
            # scheduler-inserted glue: no source metadata, but the HLO
            # definition (shape+operands) identifies the buffer it moves.
            # copy-done defs only name their copy-start — chase the
            # operand chain one hop so the SOURCE buffer's def (or source
            # metadata) is what gets printed (r3: pinned the s32[T]
            # copy pair to its producer).
            import re as _re
            a = hlo_defs.get(key, "")
            if "copy_done" in a or "copy-done" in a:
                op = _re.search(r"%([\w.-]+)\)", a)
                if op:
                    k2 = op.group(1).replace("-", "_")
                    src = hlo_defs.get(k2, "")
                    op2 = _re.search(r"copy-start\(%([\w.-]+)", src)
                    if op2:
                        k3 = op2.group(1).replace("-", "_")
                        a = (a + "  <- " + (hlo_attr.get(k3)
                                            or hlo_defs.get(k3, "")))[:220]
        return a

    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:25]
    for nm, dur in top:
        print(f"{dur / T:9.1f} us/frame  {nm[:60]:60s}  {attribution(nm)[:100]}")
    stages_us = {k: v / T for k, v in sorted(by_stage.items())}
    print("per-frame stage split (us):", json.dumps(stages_us, indent=2))

    if not on_tpu:
        # CPU smoke runs exercise the plumbing only — their timings are
        # host-lane noise and must never clobber the on-chip PROFILE.json
        # (same guard as optimize_policy.py for POLICY files)
        print("not on TPU: skipping PROFILE.json write")
        return
    out_path = "/root/repo/PROFILE.json"
    prof = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            prof = json.load(f)
    prof.setdefault("stages", {})[
        name + ("" if smode == "stack" else f"_{smode}")
        + ("_ingest" if ing else "")] = {
        "shape": [H, W], "frames": T, "tau_source": "tuned",
        "per_frame_us": stages_us,
        "top_ops_us_per_frame": [[nm, d / T, attribution(nm)]
                                 for nm, d in top[:12]],
        "note": ("device-op SELF times (nested children subtracted — "
                 "wrapper ops like the scan while no longer double-count "
                 "their bodies) aggregated from a jax.profiler trace of "
                 "one scan; names classified by Pallas kernel (detect vs "
                 "delta_conv vs pool) vs XLA glue; stage sums are "
                 "additive and should match the measured frame"),
    }
    with open(out_path, "w") as f:
        json.dump(prof, f, indent=2)
    print(f"wrote stages[{name}] into PROFILE.json")


if __name__ == "__main__":
    sys.exit(main())
