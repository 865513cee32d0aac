"""Render the repo's measured artifacts as figures (CB19 SS VI parity).

The reference published matplotlib figures from its eval scripts
(SURVEY.md SS5.5: "stdout prints + matplotlib plots"; CB19 SS VI:
throughput-vs-accuracy Pareto plots, per-layer threshold sensitivity,
per-stage timing breakdowns).  This script renders the same figure
family from the structured JSON artifacts the harnesses already emit:

  figures/speedup.png       CB vs dense fps per workload   (RESULTS.json)
  figures/pareto.png        accuracy vs FLOP-reduction Pareto per model
                            at each tuner budget            (TUNE_*.json)
  figures/sensitivity_<m>.png  per-layer tau sensitivity curves
                                                            (TUNE_*.json)
  figures/stages.png        per-stage us/frame attribution  (PROFILE.json)

Pure consumer: reads artifacts, writes PNGs, touches no device.
Usage: python scripts/plot_results.py [outdir]
"""
from __future__ import annotations

import json
import pathlib
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

ROOT = pathlib.Path(__file__).resolve().parent.parent

# Validated categorical palette (adjacent-pair CVD dE >= 8, light surface).
BLUE, ORANGE, AQUA, YELLOW = "#2a78d6", "#eb6834", "#1baf7a", "#eda100"
MAGENTA, GREEN = "#e87ba4", "#008300"
NEUTRAL = "#9a9a92"  # dense baseline: a neutral, not a series hue
INK, INK2 = "#1a1a19", "#5f5e56"

STYLE = {
    "axes.spines.top": False, "axes.spines.right": False,
    "axes.edgecolor": INK2, "axes.labelcolor": INK,
    "xtick.color": INK2, "ytick.color": INK2,
    "axes.grid": True, "grid.color": "#e6e5dd", "grid.linewidth": 0.6,
    "font.size": 9, "axes.titlesize": 10, "figure.dpi": 150,
}


def _load(name):
    p = ROOT / name
    return json.load(open(p)) if p.exists() else None


def plot_speedup(outdir: pathlib.Path) -> None:
    res = _load("RESULTS.json")
    if not res:
        return
    rows, seen = [], set()
    for r in res["rows"]:
        # One row per workload: the tuned-threshold operating point.
        if r.get("mode") == "multistream" or r["model"] in seen:
            continue
        if r.get("tau") not in ("tuned", None) and "tau" in r:
            continue
        seen.add(r["model"])
        rows.append(r)
    labels = [r["model"] for r in rows]
    cb = [r["cb_fps"] for r in rows]
    dn = [r["dense_fps"] for r in rows]
    fig, ax = plt.subplots(figsize=(6.4, 3.2))
    x = range(len(rows))
    ax.bar([i - 0.21 for i in x], dn, 0.38, color=NEUTRAL, label="dense")
    ax.bar([i + 0.21 for i in x], cb, 0.38, color=BLUE, label="change-based")
    for i, r in enumerate(rows):
        ax.text(i + 0.21, cb[i], f"{r['speedup']:.2f}x", ha="center",
                va="bottom", fontsize=8, color=INK)
    ax.set_xticks(list(x), labels)
    ax.set_ylabel("frames / s (one v5e chip, 720p)")
    ax.set_title("CB vs dense throughput — tuned taus, trained weights")
    ax.legend(frameon=False, loc="upper right")
    ax.grid(axis="x", visible=False)
    fig.tight_layout()
    fig.savefig(outdir / "speedup.png")
    plt.close(fig)


_MODEL_HUES = {"scene": BLUE, "scene_hard": ORANGE, "seg": AQUA,
               "pose": MAGENTA, "pose_graph": GREEN}


def plot_pareto(outdir: pathlib.Path) -> None:
    fig, ax = plt.subplots(figsize=(5.6, 3.6))
    drew = False
    for model, hue in _MODEL_HUES.items():
        tune = _load(f"TUNE_{model}.json")
        if not tune or "pareto" not in tune:
            continue
        pts = sorted(tune["pareto"], key=lambda p: p["flop_reduction"])
        xs = [p["flop_reduction"] for p in pts]
        # Degradation vs the tuner's dense reference on the calibration set.
        ref = max(p["metric"] for p in pts)
        ys = [max(ref - p["metric"], 0.0) * 100 for p in pts]
        ax.plot(xs, ys, "-o", color=hue, label=model, linewidth=2,
                markersize=4)
        drew = True
    if not drew:
        plt.close(fig)
        return
    ax.axhline(0.5, color=INK2, linewidth=1, linestyle="--")
    ax.text(ax.get_xlim()[1], 0.5, " 0.5% budget", va="bottom", ha="right",
            fontsize=8, color=INK2)
    ax.set_xlabel("effective FLOP reduction vs dense (x)")
    ax.set_ylabel("calibration metric degradation (pp)")
    ax.set_title("Tuner Pareto fronts (one point per budget)")
    ax.legend(frameon=False)
    fig.tight_layout()
    fig.savefig(outdir / "pareto.png")
    plt.close(fig)


def plot_sensitivity(outdir: pathlib.Path) -> None:
    for model in _MODEL_HUES:
        tune = _load(f"TUNE_{model}.json")
        if not tune or "sensitivity" not in tune:
            continue
        sens = tune["sensitivity"]
        n = len(sens)
        cmap = plt.get_cmap("Blues")
        fig, ax = plt.subplots(figsize=(5.6, 3.4))
        for i, (layer, curve) in enumerate(sorted(
                sens.items(), key=lambda kv: str(kv[0]))):
            taus = [c[0] for c in curve]
            mets = [c[1] for c in curve]
            # Sequential ramp over layer depth (ordered magnitude, one hue).
            ax.plot(taus, mets, color=cmap(0.35 + 0.6 * i / max(n - 1, 1)),
                    linewidth=1.5)
        ax.set_xscale("log")
        ax.set_xlabel("layer threshold tau (others at baseline)")
        ax.set_ylabel("end metric on calibration set")
        ax.set_title(f"{model}: per-layer tau sensitivity "
                     f"({n} layers, light=shallow, dark=deep)")
        fig.tight_layout()
        fig.savefig(outdir / f"sensitivity_{model}.png")
        plt.close(fig)


def plot_stages(outdir: pathlib.Path) -> None:
    prof = _load("PROFILE.json")
    if not prof or "stages" not in prof:
        return
    stages = prof["stages"]
    keys = ["detect", "compact", "delta_conv", "xla_compute"]
    hues = dict(zip(keys, [BLUE, YELLOW, AQUA, NEUTRAL]))
    fig, ax = plt.subplots(figsize=(6.0, 1.1 + 0.7 * len(stages)))
    models = list(stages)
    for j, m in enumerate(models):
        per = stages[m]["per_frame_us"]
        left = 0.0
        for k in keys:
            v = per.get(k, 0.0)
            ax.barh(j, v, 0.5, left=left, color=hues[k],
                    label=k if j == 0 else None)
            left += v
        ax.text(left, j, f"  {left:.0f} us attributed", va="center",
                fontsize=8, color=INK2)
    ax.set_yticks(range(len(models)), models)
    ax.invert_yaxis()
    ax.set_xlabel("per-frame device time, attributed stages (us)")
    ax.set_title("Per-stage attribution from on-chip xprof traces")
    ax.legend(frameon=False, ncol=4, loc="lower right")
    ax.grid(axis="y", visible=False)
    fig.tight_layout()
    fig.savefig(outdir / "stages.png")
    plt.close(fig)


def plot_changerate(outdir: pathlib.Path) -> None:
    """Throughput vs change rate + the worst case (CHANGERATE.json):
    the applicability-boundary figure of the reference (CB17 §1's
    quasi-static-camera premise, measured)."""
    cr = _load("CHANGERATE.json")
    if not cr or not cr.get("rows"):
        return
    rows = sorted(cr["rows"], key=lambda r: r["changed_tile_frac_layer0"])
    x = [r["changed_tile_frac_layer0"] for r in rows]
    y = [r["speedup"] for r in rows]
    fig, ax = plt.subplots(figsize=(5.6, 3.4))
    ax.plot(x, y, "-o", color=BLUE, lw=1.6, ms=4)
    for r in rows:
        if r["point"].startswith("pan"):
            ax.annotate(r["point"],
                        (r["changed_tile_frac_layer0"], r["speedup"]),
                        textcoords="offset points", xytext=(4, 6),
                        fontsize=8, color=INK2)
    ax.axhline(1.0, color=NEUTRAL, lw=1.0, ls="--")
    be = cr.get("break_even_changed_tile_frac")
    if be:
        ax.axvline(be, color=YELLOW, lw=1.0, ls=":")
        ax.annotate(f"break-even {be:.0%}", (be, 1.05), fontsize=8,
                    color=INK2, rotation=90, va="bottom")
    ax.set_xlabel("changed-tile fraction (stem layer, per frame)")
    ax.set_ylabel("CB speedup vs dense (same chip, interleaved)")
    ax.set_title("Speedup vs change rate, 720p scene (worst case: pan)")
    fig.tight_layout()
    fig.savefig(outdir / "changerate.png")
    plt.close(fig)


def main(outdir: str = "figures") -> None:
    out = ROOT / outdir
    out.mkdir(exist_ok=True)
    plot_speedup(out)
    plot_pareto(out)
    plot_sensitivity(out)
    plot_stages(out)
    plot_changerate(out)
    print("wrote", *sorted(p.name for p in out.glob("*.png")))


if __name__ == "__main__":
    main(*sys.argv[1:])
