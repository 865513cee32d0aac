"""Assemble EXP_fused_ab.json from fused-A/B queue logs, per-workload.

exp_fused_ab.py prints one JSON line per run; this collects the lines
from .queue_logs/fused_ab_*.log, writes EXP_fused_ab.json, and applies
the decision where zoo.load will actually see it: each workload that
measured a >=2% win gets ``fuse_detect: true`` written into ITS policy
JSON (POLICY_<name>.json) — the same file optimize_policy.py owns — so
the adoption takes effect in shipped behavior, not just in prose
(advisor r3: an adopt decision that only edits the experiment artifact
never reaches the loader).

Adoption is strictly per-measured-workload: a missing leg (timeout /
tunnel wedge) yields status "partial" and leaves that workload's flag
untouched — it can never be adopted by another workload's win (advisor
r3 medium: requiring the full expected set before claiming a global
result). The converter default stays OPT-IN OFF either way; policy
files are the adoption mechanism.

Idempotent; safe to re-run after every queue leg (run it per-leg so a
killed queue never orphans landed measurements — r3 lost two finished
runs to exactly that).
"""

import glob
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# workloads the A/B instrument covers (pose_graph rides the graph
# converter's own fuse pass — exp_fused_ab.py r4)
EXPECTED = ("pose", "seg", "scene", "pose_graph")
ADOPT_BAR = 1.02  # same bar optimize_policy uses for a backend flip


def collect_runs():
    runs = {}
    for path in sorted(glob.glob(os.path.join(ROOT, ".queue_logs",
                                              "fused_ab_*.log"))):
        for line in open(path):
            line = line.strip()
            if line.startswith("{") and '"fused_ms"' in line:
                try:
                    r = json.loads(line)
                    runs[r["model"]] = r  # latest line per model wins
                except json.JSONDecodeError:
                    pass
    return runs


def apply_policy_flag(model, adopt):
    """Write fuse_detect into the workload's policy JSON (creating a
    minimal one if absent) so zoo.load ships the decision."""
    path = os.path.join(ROOT, f"POLICY_{model}.json")
    pol = {}
    if os.path.exists(path):
        with open(path) as f:
            pol = json.load(f)
    if pol.get("fuse_detect", False) == adopt and (adopt or "fuse_detect"
                                                   not in pol):
        return False  # already in the desired state
    pol["fuse_detect"] = adopt
    pol.setdefault("model", model)
    with open(path, "w") as f:
        json.dump(pol, f, indent=2)
    return True


def main():
    runs = collect_runs()
    if not runs:
        print("no completed fused A/B runs in .queue_logs; leaving "
              "EXP_fused_ab.json untouched")
        return 1
    missing = [m for m in EXPECTED if m not in runs]
    speedups = {m: r["speedup"] for m, r in runs.items()}
    adopted, declined = [], []
    for m, s in sorted(speedups.items()):
        if s >= ADOPT_BAR:
            apply_policy_flag(m, True)
            adopted.append(m)
        else:
            apply_policy_flag(m, False)
            declined.append(m)
    decision = (
        f"per-workload policy adoption at the >={ADOPT_BAR}x bar: "
        f"fuse_detect ON for {adopted or 'none'} (written into their "
        f"POLICY_*.json, which zoo.load and bench.py apply), OFF for "
        f"{declined or 'none'}; converter default stays opt-in OFF. "
        + json.dumps(speedups))
    status = ("measured at HEAD with the fused wiring live (post-cde0651; "
              "bit-parity proven on-chip by scripts/check_fused_parity_"
              "tpu.py)" + ("" if not missing else
                           f" — PARTIAL: legs never landed for {missing}, "
                           "their flags untouched"))
    out = {
        "experiment": ("scripts/exp_fused_ab.py: fused consumer-detect "
                       "kernel ON vs OFF, both variants compiled in ONE "
                       "process, interleaved reps over identical "
                       "device-resident 720p chunks, medians"),
        "status": status,
        "decision": decision,
        "runs": sorted(runs.values(), key=lambda r: r["model"]),
    }
    with open(os.path.join(ROOT, "EXP_fused_ab.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("EXP_fused_ab.json written:", decision)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
