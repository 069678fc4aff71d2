"""Prototype label registry: hand-curated human-readable labels for
specific trained runs, used by visualization/attribution legends.

Reference: util/enums.py:1-56 — a dict keyed by run name, each value a list
of {"prototype": idx, "label": str} entries (e.g. "Circ(3)" = a prototype
firing on three circles, "Dead" = never active). The reference ships labels
for 3 of its trained runs; entries here are registered per-run by users of
this framework via :func:`register_labels` (label sets are checkpoints'
metadata, not portable across differently-seeded runs).
"""

from typing import Dict, List

__all__ = ["prototype_labels", "register_labels", "labels_for_run"]

# run-name -> [{"prototype": int, "label": str}, ...]
prototype_labels: Dict[str, List[dict]] = {
    # Example structure (labels are per-trained-run artifacts):
    "example_shapes_run": [
        {"prototype": 0, "label": "Circ(1)"},
        {"prototype": 1, "label": "Hex(1,2)"},
        {"prototype": 2, "label": "Dead"},
    ],
}


def register_labels(run_name: str, labels: List[dict]):
    """Register or replace the label set for a run."""
    prototype_labels[run_name] = list(labels)


def labels_for_run(run_name: str) -> Dict[int, str]:
    """Return {prototype_idx: label} for a run ('' labels by default)."""
    entries = prototype_labels.get(run_name, [])
    return {e["prototype"]: e["label"] for e in entries}
