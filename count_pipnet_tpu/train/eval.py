"""Test-set evaluation engine.

Reference: pipnet/test.py:12-185 (eval_pipnet). All per-batch statistics run
in one jitted device step (train/steps.py:make_eval_step); this module owns
the host loop, the virtual-weight construction, the destructive per-batch
weight shrink the reference performs inside eval (test.py:71-73 — it
mutates the live classifier weights by -1e-3 per batch; reproduced
faithfully since it feeds back into training), and the binary-task extras
(sensitivity/specificity/balanced accuracy/AUC, test.py:159-183).
"""

from collections import deque
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.pipnet import CountPIPNet, importance_per_class
from .steps import make_eval_step

__all__ = ["evaluate", "class_prototype_weights", "acc_from_cm"]


def acc_from_cm(cm: np.ndarray) -> float:
    """Accuracy from a confusion matrix (reference test.py:248-264)."""
    assert cm.ndim == 2 and cm.shape[0] == cm.shape[1]
    total = cm.sum()
    return float(np.trace(cm) / total) if total > 0 else 1.0


def class_prototype_weights(model, params):
    """[num_classes, num_prototypes] effective weights: virtual importance
    matrix for Count-PIPNet, raw classifier weights for PIP-Net
    (reference test.py:51-64)."""
    if isinstance(model, CountPIPNet):
        bound = model.bind({"params": params})
        return importance_per_class(bound, params)
    return params["classification"]["weight"]


@jax.jit
def _shrink_weight(w):
    return jnp.maximum(w - 1e-3, 0.0)


def evaluate(model, params, batch_stats, test_loader, epoch, *,
             num_classes: int, enforce_weight_sparsity: bool = True,
             rng: Optional[jax.Array] = None, tau: float = 1.0,
             progress_prefix: str = "Eval Epoch",
             class_to_idx: Optional[dict] = None,
             eval_step=None, pipeline_depth: int = 2) -> Dict:
    """Run the full evaluation pass. Returns the reference's info dict
    (test.py:149-157) plus updated params (the destructive shrink persists,
    like the reference's in-place copy_).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if eval_step is None:
        eval_step = make_eval_step(model, num_classes=num_classes)

    cpw = class_prototype_weights(model, params)

    cm = np.zeros((num_classes, num_classes), dtype=np.int64)
    n_images = 0
    abstained = 0
    top5_sum = 0.0
    pred_local_sum = any_local_sum = 0.0
    ppc_sum = anz_sum = 0.0
    y_trues, y_preds, y_pred_classes = [], [], []

    model_state = {"batch_stats": batch_stats} if batch_stats else {}

    # Bounded dispatch window (same contract as the trainer's
    # --pipeline_depth): fetch batch i's stats only after the window
    # fills, so the loader's decode and the device's eval step overlap.
    # depth 0 = fully synchronous (fetch every step), the pre-window
    # behavior users rely on when isolating a device-side failure.
    depth = max(int(pipeline_depth), 0)
    pending = deque()

    def _drain_one():
        nonlocal cm, n_images, abstained, top5_sum, pred_local_sum, \
            any_local_sum, ppc_sum, anz_sum
        stats, bs, ys_host = pending.popleft()
        stats = jax.device_get(stats)
        # Weight every per-batch mean by the batch size so a ragged final
        # batch (testloader has drop_last=False) does not bias the global
        # means; the reference counts per-image over the whole set
        # (test.py:127-142).
        n_images += bs
        cm += np.asarray(stats["cm"], dtype=np.int64)
        abstained += int(stats["abstained"])
        top5_sum += float(stats["top5_mean"]) * bs
        pred_local_sum += float(stats["pred_class_sizes_mean"]) * bs
        any_local_sum += float(stats["any_class_sizes_mean"]) * bs
        ppc_sum += float(stats["prototypes_per_class_mean"]) * bs
        anz_sum += float(stats["almost_nz_mean"]) * bs
        y_trues.extend(ys_host.tolist())
        y_preds.extend(stats["pred_scores"].tolist())
        y_pred_classes.extend(stats["ys_pred"].tolist())

    for xs, ys in test_loader:
        if enforce_weight_sparsity:
            params = dict(params)
            clf = dict(params["classification"])
            clf["weight"] = _shrink_weight(clf["weight"])
            params["classification"] = clf
        rng, sub = jax.random.split(rng)
        stats = eval_step(params, model_state, jnp.asarray(xs),
                          jnp.asarray(ys), cpw, sub, tau)
        ys_host = np.asarray(ys)
        pending.append((stats, int(ys_host.shape[0]), ys_host))
        while len(pending) > depth:
            _drain_one()
    while pending:
        _drain_one()

    print(f"PIP-Net abstained from a decision for {abstained} images",
          flush=True)

    w = np.asarray(params["classification"]["weight"])
    num_nonzero_protos = int((np.asarray(cpw) > 1e-3).any(axis=0).sum())
    sparsity = (w.size - np.count_nonzero(np.maximum(w - 1e-3, 0))) / w.size
    print("sparsity ratio:", sparsity, flush=True)

    n = max(n_images, 1)
    info = {
        "num non-zero prototypes": num_nonzero_protos,
        "confusion_matrix": cm,
        "test_accuracy": acc_from_cm(cm),
        # Top-1 derived from the (exact, per-image) confusion matrix —
        # identical to a batch mean on divisible loaders, unbiased on a
        # ragged final batch (reference global counting, test.py:127-142).
        "top1_accuracy": acc_from_cm(cm),
        "top5_accuracy": top5_sum / n,
        "local_size_for_true_class": pred_local_sum / n,
        "local_size_for_all_classes": any_local_sum / n,
        "prototypes_per_class": ppc_sum / n,
        "almost_nonzeros": anz_sum / n,
        "sparsity_ratio": float(sparsity),
    }

    if num_classes == 2:
        tp, fn = cm[0][0], cm[0][1]
        fp, tn = cm[1][0], cm[1][1]
        print("TP:", tp, "FN:", fn, "FP:", fp, "TN:", tn, flush=True)
        sensitivity = tp / (tp + fn) if (tp + fn) else 0.0
        specificity = tn / (tn + fp) if (tn + fp) else 0.0
        info["sensitivity"] = sensitivity
        info["specificity"] = specificity
        print("Confusion matrix:", cm, flush=True)
        try:
            from sklearn.metrics import balanced_accuracy_score, \
                roc_auc_score
            info["balanced_accuracy"] = balanced_accuracy_score(
                y_trues, y_pred_classes)
            print("Balanced accuracy:", info["balanced_accuracy"],
                  flush=True)
            info["auc_macro"] = roc_auc_score(y_trues, y_preds,
                                              average="macro")
            info["auc_weighted"] = roc_auc_score(y_trues, y_preds,
                                                 average="weighted")
            print("AUC macro:", info["auc_macro"], flush=True)
        except Exception:
            pass
        print("Sensitivity:", sensitivity, "Specificity:", specificity,
              flush=True)

    return info, params


def evaluate_model_lightweight(model, params, batch_stats, loader, *,
                               num_classes, rng=None):
    """Accuracy + confusion matrix only (reference test.py:187-246)."""
    info, _ = evaluate(model, params, batch_stats, loader, epoch="light",
                       num_classes=num_classes,
                       enforce_weight_sparsity=False, rng=rng)
    return {"accuracy": info["test_accuracy"],
            "confusion_matrix": info["confusion_matrix"],
            "num_classes": num_classes}
