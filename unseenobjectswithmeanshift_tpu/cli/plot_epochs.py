"""Plot training/eval metric curves from one or more runs' metrics.jsonl.

The generic equivalent of the reference's tools/plot_epochs.py (which plots
hardcoded per-epoch F-measure arrays for the UCN input-mode comparison): give
it the metrics.jsonl files the trainers write (utils/metrics_log.py) and it
renders loss curves and the eval metric curves (Objects/Boundary F-measure,
obj_detected_075_percentage) per run.

    python -m unseenobjectswithmeanshift_tpu.cli.plot_epochs \
        runs/rgbd/metrics.jsonl runs/depth/metrics.jsonl \
        --labels RGBD DEPTH --out curves.png
"""

from __future__ import annotations

import argparse
import os

# categorical palette (validated colorblind-safe order; see the dataviz palette
# reference): blue, orange, aqua, yellow, magenta, green, violet, red
CATEGORICAL = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100",
               "#e87ba4", "#008300", "#4a3aa7", "#e34948"]
INK = "#333333"
MUTED = "#767676"
GRID = "#e3e3e3"

EVAL_KEYS = [
    ("Objects F-measure", "Objects F"),
    ("Boundary F-measure", "Boundary F"),
    ("obj_detected_075_percentage", "% detected @0.75"),
]
LOSS_KEYS = ["total_loss", "loss_ce", "loss_mask", "loss_dice", "loss"]


def _style(ax, title):
    ax.set_title(title, color=INK, fontsize=11)
    ax.grid(True, color=GRID, linewidth=0.6)
    ax.tick_params(colors=MUTED, labelsize=8)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)
    ax.set_xlabel("iteration", color=MUTED, fontsize=9)


def main(argv=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..utils.metrics_log import read_metrics, series

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("logs", nargs="+", help="metrics.jsonl file(s), one per run")
    p.add_argument("--labels", nargs="*", default=None,
                   help="legend label per run (default: parent dir name)")
    p.add_argument("--out", default="epochs.png")
    p.add_argument("--bars", action="store_true",
                   help="bar-chart each run's FINAL eval metrics instead of "
                        "curves (the tools/plot_bar_charts.py figure)")
    args = p.parse_args(argv)

    labels = args.labels or [
        os.path.basename(os.path.dirname(os.path.abspath(f))) or f
        for f in args.logs]
    if len(labels) != len(args.logs):
        raise SystemExit("--labels must match the number of log files")
    runs = [(lab, read_metrics(f)) for lab, f in zip(labels, args.logs)]

    if args.bars:
        _plot_bars(plt, runs, args.out)
        return

    have_eval = any(any(r.get("kind") == "eval" for r in recs)
                    for _, recs in runs)
    panels = [(k, t) for k, t in EVAL_KEYS if have_eval and any(
        any(k in r for r in recs) for _, recs in runs)]

    n = 1 + len(panels)
    fig, axes = plt.subplots(1, n, figsize=(4.2 * n, 3.4), dpi=120)
    axes = [axes] if n == 1 else list(axes)

    # one categorical slot per RUN (identity follows the run across panels)
    ax = axes[0]
    # the loss key is chosen PER RUN (an MSMFormer run logs total_loss, a UCN
    # run logs loss; a cross-run comparison must not drop either)
    for i, (lab, recs) in enumerate(runs):
        train = [r for r in recs if r.get("kind") == "train"]
        key = next((k for k in LOSS_KEYS if any(k in r for r in train)),
                   "total_loss")
        xs, ys = series(train, key)
        if xs:
            ax.plot(xs, ys, color=CATEGORICAL[i % len(CATEGORICAL)],
                    linewidth=1.6, label=lab)
    _style(ax, "training loss")
    if len(runs) > 1:
        ax.legend(frameon=False, fontsize=8, labelcolor=INK)

    for ax, (key, title) in zip(axes[1:], panels):
        for i, (lab, recs) in enumerate(runs):
            xs, ys = series([r for r in recs if r.get("kind") == "eval"], key)
            if xs:
                ax.plot(xs, ys, color=CATEGORICAL[i % len(CATEGORICAL)],
                        linewidth=1.6, marker="o", markersize=3.2, label=lab)
        _style(ax, title)
        ax.set_ylim(0, 1)

    fig.tight_layout()
    fig.savefig(args.out, facecolor="white")
    print(f"wrote {args.out} ({n} panel(s), {len(runs)} run(s))")


def _plot_bars(plt, runs, out):
    """One panel per eval metric, one thin bar per run, direct value labels
    (magnitude comparison across runs - the reference's grouped-bar figure)."""
    panels = [(k, t) for k, t in EVAL_KEYS if any(
        any(k in r for r in recs if r.get("kind") == "eval")
        for _, recs in runs)]
    if not panels:
        raise SystemExit("--bars needs eval records in the logs")
    fig, axes = plt.subplots(1, len(panels), figsize=(3.4 * len(panels), 3.4),
                             dpi=120)
    axes = [axes] if len(panels) == 1 else list(axes)
    for ax, (key, title) in zip(axes, panels):
        for i, (lab, recs) in enumerate(runs):
            ev = [r for r in recs if r.get("kind") == "eval" and key in r]
            if not ev:
                continue
            v = ev[-1][key]
            ax.bar(i, v, width=0.62, color=CATEGORICAL[i % len(CATEGORICAL)])
            ax.text(i, v + 0.02, f"{v:.3f}", ha="center", va="bottom",
                    color=INK, fontsize=8)
        ax.set_xticks(range(len(runs)))
        ax.set_xticklabels([lab for lab, _ in runs], color=INK, fontsize=8)
        _style(ax, title)
        ax.set_xlabel("")
        ax.set_ylim(0, 1.05)
    fig.tight_layout()
    fig.savefig(out, facecolor="white")
    print(f"wrote {out} ({len(panels)} metric(s), {len(runs)} run(s))")


if __name__ == "__main__":
    main()
