"""Render the eval-quality trajectory (F1@τ / F1@2τ vs optimizer step) as a PNG.

Reads the eval points that the trainer appends to ``train_metrics.jsonl``
(keys ``eval_mean_f1_tau`` / ``eval_mean_f1_2tau``) from one or more run
directories — the runs share one global step axis because later runs warm-start
from earlier checkpoints — and draws a single-axis line chart with regime
boundaries annotated.  Matches the reference's README-figure role (SURVEY.md
§2.1 #14) for the quality metric of record (§3.4).

  python experiments/plot_trajectory.py --runs runs/hr3,runs/hr4 \
      --out runs/hr4/trajectory.png \
      --marks "40800=962->2502 verts warm start,92820=anneal restart"
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# palette: categorical slots 1-2 (validated order), light-surface chrome
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK_2ND = "#52514e"
MUTED = "#898781"
GRID = "#e1e0d9"
BASELINE = "#c3c2b7"
SERIES = ("#2a78d6", "#eb6834")  # blue, orange


@dataclasses.dataclass(frozen=True)
class PlotArgs:
    runs: str = "runs/hr3,runs/hr4"
    out: str = "runs/hr4/trajectory.png"
    marks: str = ""   # "step=label,step=label" vertical regime boundaries
    title: str = "Single-image mesh reconstruction, 13-class test F1"
    # compare mode: OVERLAY runs as separate F1@τ series on a per-run epoch
    # axis instead of merging them onto one global step axis.  Spec per run:
    # "dir=label@step_offset/steps_per_epoch" (offset subtracts a warm-start
    # prefix so epoch 0 = first step at the budget being compared), e.g.
    # --compare "runs/hr4=hidden 192 (warm)@40800/1014,runs/xl1=hidden 256@0/1020"
    compare: str = ""


def load_points(run_dirs):
    pts = {}   # step -> (f1_tau, f1_2tau); later runs override duplicates
    for rd in run_dirs:
        path = os.path.join(rd, "train_metrics.jsonl")
        if not os.path.exists(path):
            continue
        with open(path) as fh:
            for line in fh:
                d = json.loads(line)
                if "eval_mean_f1_tau" in d:
                    pts[int(d["step"])] = (float(d["eval_mean_f1_tau"]),
                                           float(d["eval_mean_f1_2tau"]))
    return sorted(pts.items())


def _styled_axes(title):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7.2, 3.6), dpi=160)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)
    for spine in ("top", "right", "left"):
        ax.spines[spine].set_visible(False)
    ax.spines["bottom"].set_color(BASELINE)
    ax.grid(axis="y", color=GRID, linewidth=0.8)
    ax.set_axisbelow(True)
    ax.tick_params(colors=MUTED, labelsize=8, length=0)
    ax.set_title(title, color=INK, fontsize=10, loc="left", pad=16)
    return fig, ax


def compare_runs(args) -> None:
    """Overlay each run's F1@τ as its own series vs per-run epoch (the
    capacity-ablation figure: does the wider model's curve sit above the
    narrower one at matched epochs at the same vertex budget?)."""
    series = []
    for spec in args.compare.split(","):
        rd, rest = spec.split("=", 1)
        label, tail = rest.split("@", 1)
        off, spe = (int(x) for x in tail.split("/", 1))
        pts = [((s - off) / spe, f1t) for s, (f1t, _) in load_points([rd])
               if s >= off]
        if pts:
            series.append((label, pts))
    if not series:
        raise SystemExit("no eval points found for compare specs")

    fig, ax = _styled_axes(args.title)
    ymax = 0.0
    for (label, pts), color in zip(series, SERIES):
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        ymax = max(ymax, max(ys))
        ax.plot(xs, ys, color=color, linewidth=2, marker="o",
                markersize=4.5, label=label)
        ax.annotate(f"{ys[-1]:.3f}", (xs[-1], ys[-1]), xytext=(6, -3),
                    textcoords="offset points", color=INK_2ND, fontsize=8)
    ax.set_xlabel("epochs at the 2502-vert budget", color=INK_2ND, fontsize=9)
    ax.set_ylabel("mean test F1@τ", color=INK_2ND, fontsize=9)
    ax.set_ylim(0, ymax * 1.25)
    ax.legend(loc="upper left", frameon=False, fontsize=8, labelcolor=INK_2ND)
    fig.tight_layout()
    fig.savefig(args.out, facecolor=SURFACE)
    print(f"[plot] compare {len(series)} runs -> {args.out}")


def main() -> None:
    from geometrics_tpu.utils.cli import parse_into

    args = parse_into(PlotArgs())
    if args.compare:
        compare_runs(args)
        return
    points = load_points(args.runs.split(","))
    if not points:
        raise SystemExit("no eval points found")
    steps = [s / 1000 for s, _ in points]
    f1t = [v[0] for _, v in points]
    f12t = [v[1] for _, v in points]

    fig, ax = _styled_axes(args.title)

    for label in args.marks.split(","):
        if "=" not in label:
            continue
        s, text = label.split("=", 1)
        x = float(s) / 1000
        ax.axvline(x, color=GRID, linewidth=1.0)
        ax.text(x, 1.015, text, transform=ax.get_xaxis_transform(),
                color=MUTED, fontsize=7, ha="center")

    for ys, color, name in ((f1t, SERIES[0], "F1@τ (τ=1e-4, paper protocol)"),
                            (f12t, SERIES[1], "F1@2τ")):
        ax.plot(steps, ys, color=color, linewidth=2, marker="o",
                markersize=4.5, label=name)
        ax.annotate(f"{ys[-1]:.3f}", (steps[-1], ys[-1]), xytext=(6, -3),
                    textcoords="offset points", color=INK_2ND, fontsize=8)

    ax.set_xlabel("optimizer step (thousands)", color=INK_2ND, fontsize=9)
    ax.set_ylabel("mean test F1", color=INK_2ND, fontsize=9)
    ax.set_ylim(0, max(f12t) * 1.25)
    ax.legend(loc="upper left", frameon=False, fontsize=8,
              labelcolor=INK_2ND)
    fig.tight_layout()
    fig.savefig(args.out, facecolor=SURFACE)
    print(f"[plot] {len(points)} eval points -> {args.out}")


if __name__ == "__main__":
    main()
