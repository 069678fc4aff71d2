"""Multi-run / multi-seed evaluation report.

Script analogue of the reference's ``notebooks/evaluate.ipynb`` and the
(missing-from-snapshot) ``evaluate_multiple_seeds.ipynb``: collects every
run's ``log_epoch_overview.csv``, extracts the best test accuracy and the
interpretability metrics at that epoch, groups runs of the same config
name (seed suffixes and sweep timestamps stripped) and reports
mean +/- std across seeds, renders an accuracy-curve overlay, and writes
a markdown table.

Usage:
    python notebooks/evaluate_runs.py --runs_root ./runs/sweep_r2 \
        [--out_dir ./analysis] [--markdown ACCURACY.md]
    python notebooks/evaluate_runs.py --run_dirs runA runB ...
"""

import argparse
import csv
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

METRICS = ("test_top1_acc", "local_size_for_true_class",
           "local_size_for_all_classes", "prototypes_per_class",
           "almost_nonzeros_pooled", "num_nonzero_prototypes")


def parse_run(run_dir):
    """Read log_epoch_overview.csv -> dict of per-epoch numeric columns
    (pretrain 'n.a.' rows skipped) + the best-accuracy row."""
    path = os.path.join(run_dir, "log_epoch_overview.csv")
    if not os.path.exists(path):
        return None
    rows = []
    with open(path) as f:
        reader = csv.DictReader(f)
        for row in reader:
            if row.get("test_top1_acc", "n.a.") in ("n.a.", "", None):
                continue
            try:
                rows.append({k: float(v) for k, v in row.items()
                             if v not in ("n.a.", "", None)})
            except ValueError:
                continue
    if not rows:
        return None
    best = max(rows, key=lambda r: r.get("test_top1_acc", -1))
    return {"rows": rows, "best": best,
            "epochs": [r["epoch"] for r in rows],
            "top1": [r.get("test_top1_acc", np.nan) for r in rows]}


def config_name(run_dir):
    """onehot_seed2_20260816_123456 -> onehot; linear_2026... -> linear."""
    name = os.path.basename(os.path.normpath(run_dir))
    name = re.sub(r"_\d{8}_\d{6}$", "", name)   # sweep timestamp
    name = re.sub(r"_seed\d+$", "", name)       # seed suffix
    return name


def collect(run_dirs):
    groups = defaultdict(list)
    for rd in run_dirs:
        parsed = parse_run(rd)
        if parsed is None:
            print(f"(no usable CSV in {rd}, skipping)")
            continue
        groups[config_name(rd)].append((rd, parsed))
    return groups


def report(groups, out_dir, markdown=None):
    os.makedirs(out_dir, exist_ok=True)
    lines = [
        "| config | seeds | best top-1 (mean +/- std) | best epoch | "
        "local size (true) | protos/class | nonzero protos |",
        "|---|---|---|---|---|---|---|",
    ]
    for name in sorted(groups):
        runs = groups[name]
        best_acc = [p["best"]["test_top1_acc"] for _, p in runs]
        best_ep = [p["best"]["epoch"] for _, p in runs]

        def stat(key):
            vals = [p["best"].get(key) for _, p in runs
                    if p["best"].get(key) is not None]
            return float(np.mean(vals)) if vals else float("nan")

        acc_str = f"{np.mean(best_acc):.3f}"
        if len(best_acc) > 1:
            acc_str += f" +/- {np.std(best_acc):.3f}"
        lines.append(
            f"| {name} | {len(runs)} | {acc_str} | "
            f"{np.mean(best_ep):.0f} | "
            f"{stat('local_size_for_true_class'):.2f} | "
            f"{stat('prototypes_per_class'):.2f} | "
            f"{stat('num_nonzero_prototypes'):.1f} |")
        print(lines[-1])

    # accuracy-curve overlay
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(8, 5))
        for name in sorted(groups):
            for rd, p in groups[name]:
                ax.plot(p["epochs"], p["top1"], alpha=0.8,
                        label=f"{name} ({os.path.basename(rd)[:24]})")
        ax.set_xlabel("epoch")
        ax.set_ylabel("test top-1")
        ax.legend(fontsize=6)
        ax.grid(alpha=0.3)
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "accuracy_curves.png"), dpi=120)
        plt.close(fig)
    except Exception as e:  # matplotlib optional for the table itself
        print(f"(curve plot skipped: {e})")

    table = "\n".join(lines)
    with open(os.path.join(out_dir, "evaluation_table.md"), "w") as f:
        f.write(table + "\n")
    if markdown:
        with open(markdown, "w") as f:
            f.write("# Accuracy report\n\n"
                    "Best test top-1 per config (mean +/- std over "
                    "seeds), from log_epoch_overview.csv of each run.\n\n"
                    + table + "\n")
    return table


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs_root", type=str, default="")
    ap.add_argument("--run_dirs", nargs="*", default=[])
    ap.add_argument("--out_dir", type=str, default="./analysis")
    ap.add_argument("--markdown", type=str, default="")
    args = ap.parse_args()

    run_dirs = list(args.run_dirs)
    if args.runs_root:
        run_dirs += [os.path.join(args.runs_root, d)
                     for d in sorted(os.listdir(args.runs_root))
                     if os.path.isdir(os.path.join(args.runs_root, d))]
    if not run_dirs:
        ap.error("no runs given")
    groups = collect(run_dirs)
    report(groups, args.out_dir, markdown=args.markdown or None)


if __name__ == "__main__":
    main()
