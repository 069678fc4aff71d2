"""Flagship-scale (200-class, 224^2) run comparison figure.

Overlays the test top-1 curves of every flagship_200* run so the
collapse-attribution story documented in analysis/flagship_200_*/README.md
is visible at a glance: the unfrozen-backbone runs collapse at their
unfreeze epoch, the frozen-backbone (stable) recipe converges, and the
no-sparsity-projection run shows the recipe's accuracy ceiling.

Reads the committed CSV copies under analysis/ first and falls back to
the (gitignored) full trees under runs/, so the figure is reproducible
from a fresh clone.

Usage:
    python notebooks/flagship_compare.py [--out analysis/flagship_200_curves.png]
"""

import argparse
import csv
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (label, csv candidates, annotation: (epoch, text) or None)
RUNS = [
    ("long (unfreeze @11)",
     ["analysis/flagship_200_long/epochs_1_37_recovered.csv",
      "runs/flagship_200_long/log_epoch_overview.csv"],
     (11, "unfreeze")),
    ("fast (freeze_epochs 0)",
     ["analysis/flagship_200_fast/log_epoch_overview.csv",
      "runs/flagship_200_fast/log_epoch_overview.csv"],
     None),
    ("canon (staged 20/30/60)",
     ["analysis/flagship_200_canon/log_epoch_overview.csv",
      "runs/flagship_200_canon/log_epoch_overview.csv"],
     (31, "full unfreeze")),
    ("stable (frozen backbone)",
     ["analysis/flagship_200_stable/log_epoch_overview.csv",
      "runs/flagship_200_stable/log_epoch_overview.csv"],
     None),
    ("nosparse (frozen, no sparsity proj.)",
     ["analysis/flagship_200_nosparse/log_epoch_overview.csv",
      "runs/flagship_200_nosparse/log_epoch_overview.csv"],
     None),
    ("warmup (staged + LR ramp @31-40)",
     ["analysis/flagship_200_warmup/log_epoch_overview.csv",
      "runs/flagship_200_warmup/log_epoch_overview.csv"],
     (31, "warmup unfreeze")),
    ("wide (nosparse, 256 prototypes)",
     ["analysis/flagship_200_wide/log_epoch_overview.csv",
      "runs/flagship_200_wide/log_epoch_overview.csv"],
     None),
    ("x4 (wide recipe, 4x data)",
     ["analysis/flagship_200_x4/log_epoch_overview.csv",
      "runs/flagship_200_x4/log_epoch_overview.csv"],
     None),
]


def read_curve(path):
    epochs, top1 = [], []
    with open(path) as f:
        rows = (ln for ln in f if not ln.startswith("#"))
        for row in csv.DictReader(rows):
            try:
                ep, t1 = int(float(row["epoch"])), float(row["test_top1_acc"])
            except (ValueError, KeyError):
                continue  # pretrain "n.a." rows
            epochs.append(ep)
            top1.append(t1)
    return epochs, top1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        REPO, "analysis", "flagship_200_curves.png"))
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 5))
    plotted = 0
    for label, candidates, note in RUNS:
        path = next((os.path.join(REPO, c) for c in candidates
                     if os.path.exists(os.path.join(REPO, c))), None)
        if path is None:
            print(f"(skipping {label}: no CSV found)")
            continue
        epochs, top1 = read_curve(path)
        if not epochs:
            continue
        (line,) = ax.plot(epochs, top1, alpha=0.85, label=label)
        best_i = max(range(len(top1)), key=top1.__getitem__)
        ax.plot(epochs[best_i], top1[best_i], "o", ms=4,
                color=line.get_color())
        if note is not None:
            ep, text = note
            if ep <= max(epochs):
                ax.axvline(ep, color=line.get_color(), ls=":", alpha=0.5)
                ax.annotate(text, (ep, max(top1)), fontsize=7,
                            color=line.get_color(),
                            xytext=(2, 2), textcoords="offset points")
        plotted += 1
    ax.axhline(1.0 / 200, color="gray", ls="--", alpha=0.5, lw=0.8)
    ax.annotate("chance (0.5%)", (1, 1.0 / 200), fontsize=7, color="gray",
                xytext=(2, 3), textcoords="offset points")
    ax.set_xlabel("main-phase epoch")
    ax.set_ylabel("test top-1 (200 classes)")
    ax.set_title("flagship_200: convnext_tiny_26, 224², random init, "
                 "align-pretrained 10 ep")
    ax.legend(fontsize=8, loc="center right")
    ax.grid(alpha=0.3)
    fig.tight_layout()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    fig.savefig(args.out, dpi=120)
    plt.close(fig)
    print(f"wrote {args.out} ({plotted} runs)")
    return 0 if plotted else 1


if __name__ == "__main__":
    sys.exit(main())
