"""Multi-run comparison analysis.

Reference: notebooks/interp_many.py — loads several trained runs, runs the
per-run interpretation pipeline (run_analysis_pipeline :182) and renders a
combined prototype-importance scatter across runs (:165).

Usage:
    python notebooks/interp_many.py --run_dirs runA runB ... \
        [--out_dir ./analysis]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from main_interp import calculate_global_explanation, \
    show_global_explanation


def run_analysis_pipeline(run_dirs, out_dir, checkpoint="net_best"):
    """Per-run global explanations + cross-run importance comparison
    (reference notebooks/interp_many.py:182)."""
    os.makedirs(out_dir, exist_ok=True)
    explanations = {}
    for run_dir in run_dirs:
        name = os.path.basename(os.path.normpath(run_dir))
        try:
            expl = calculate_global_explanation(run_dir, checkpoint)
        except Exception as e:
            print(f"skipping {run_dir}: {e}")
            continue
        explanations[name] = expl
        show_global_explanation(
            expl, os.path.join(out_dir, f"{name}_global.png"))

    if len(explanations) >= 2:
        combined_importance_scatter(explanations, out_dir)
    summary_table(explanations, out_dir)
    return explanations


def combined_importance_scatter(explanations, out_dir):
    """Prototype total importance per run, overlaid
    (reference interp_many.py:165)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 4))
    for name, expl in explanations.items():
        imp = expl["weights"].sum(axis=0)   # total importance per prototype
        ax.scatter(range(len(imp)), np.sort(imp)[::-1], s=14, label=name,
                   alpha=0.7)
    ax.set_xlabel("Prototype rank")
    ax.set_ylabel("Total importance")
    ax.set_yscale("symlog", linthresh=1e-3)
    ax.legend(fontsize=7)
    fig.tight_layout()
    path = os.path.join(out_dir, "combined_importance_scatter.png")
    fig.savefig(path, dpi=130)
    plt.close(fig)
    print(f"Combined importance scatter: {path}")


def summary_table(explanations, out_dir):
    """CSV summary: run, #prototypes, #active (importance > 1e-3),
    sparsity."""
    lines = ["run,num_prototypes,num_active,importance_sparsity"]
    for name, expl in explanations.items():
        w = expl["weights"]
        active = int((w.max(axis=0) > 1e-3).sum())
        sparsity = float((w <= 1e-3).mean())
        lines.append(f"{name},{w.shape[1]},{active},{sparsity:.4f}")
    path = os.path.join(out_dir, "runs_summary.csv")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"Summary table: {path}")


def main():
    ap = argparse.ArgumentParser("Compare multiple trained runs")
    ap.add_argument("--run_dirs", nargs="+", required=True)
    ap.add_argument("--out_dir", default="./analysis")
    ap.add_argument("--checkpoint", default="net_best")
    args = ap.parse_args()
    run_analysis_pipeline(args.run_dirs, args.out_dir, args.checkpoint)


if __name__ == "__main__":
    main()
