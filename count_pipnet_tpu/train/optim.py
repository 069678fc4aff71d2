"""Parameter grouping, LR schedules, and a phase-masked AdamW.

The reference drives training-phase structure through three mutable
mechanisms: per-phase ``requires_grad`` flips (main.py:238-253, 315-390), two
torch AdamW optimizers over disjoint param groups (util/args.py:250-331), and
schedulers stepped at different granularities (train.py:116-124). The
TPU-native design replaces all three with pure data:

* ``label_params`` assigns every param leaf a static *label* (group);
* learning rates and trainability are **runtime scalars per label**
  (9 floats), so one compiled train step covers pretrain/finetune/frozen/
  unfrozen phases with zero recompilation;
* ``adamw_update`` is a torch-semantics AdamW where masked-out leaves keep
  params, moments AND step counts untouched — exactly like a torch param
  with ``requires_grad=False`` (its optimizer state never advances).

Schedules (host-side, exact torch formulas):
* ``cosine_lr`` = CosineAnnealingLR closed form, stepped per iteration with
  T_max = len(loader) * epochs (main.py:209,309);
* ``warm_restart_lr`` = CosineAnnealingWarmRestarts with T_mult=1 and the
  fractional ``epoch - 1 + i/iters`` stepping (train.py:118, main.py:311-314).
"""

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

__all__ = [
    "label_params", "adamw_init", "adamw_update",
    "cosine_lr", "warm_restart_lr", "NET_LABELS", "CLASSIFIER_LABELS",
]

# Labels owned by the "net" optimizer vs the "classifier" optimizer
# (reference util/args.py:307-323).
NET_LABELS = ("backbone", "to_freeze", "to_train", "add_on")
CLASSIFIER_LABELS = ("cls_weight", "cls_bias", "intermediate")
ALL_LABELS = NET_LABELS + CLASSIFIER_LABELS + ("frozen",)


def _convnext_stage(name: str) -> Optional[int]:
    # names look like features_0, features_2, features_3_block_1
    if not name.startswith("features_"):
        return None
    try:
        return int(name.split("_")[1])
    except (IndexError, ValueError):
        return None


def _label_backbone_leaf(path, net: str, use_mid_layers: bool,
                         num_stages: int) -> str:
    """Group one backbone param by its module path (tuple of names).

    ConvNeXt full (util/args.py:273-279): features.7.2 -> train;
    features.7|6 -> freeze; rest -> backbone.
    ConvNeXt mid-layers (util/args.py:333-402): stage == num_stages -> train;
    stage == num_stages-1 -> freeze; earlier -> backbone.
    ResNet50 (util/args.py:282-290): layer4.2 -> train; layer4|3 -> freeze;
    layer2 -> backbone; earlier layers permanently frozen.
    """
    top = path[0]
    if "convnext" in net:
        stage = _convnext_stage(top)
        if stage is None:
            return "backbone"
        if use_mid_layers and num_stages < 7:
            if stage == num_stages:
                return "to_train"
            if stage == num_stages - 1:
                return "to_freeze"
            return "backbone"
        if top == "features_7_block_2":
            return "to_train"
        if top.startswith("features_7") or top.startswith("features_6"):
            return "to_freeze"
        return "backbone"
    if "resnet50" in net:
        if top == "layer4_block_2":
            return "to_train"
        if top.startswith("layer4") or top.startswith("layer3"):
            return "to_freeze"
        if top.startswith("layer2"):
            return "backbone"
        return "frozen"
    # Other resnets: the reference prints a warning and trains nothing of
    # the backbone through optimizer_net groups; keep everything frozen.
    return "frozen"


def label_params(params, net: str, use_mid_layers: bool = False,
                 num_stages: int = 2, train_intermediate: bool = True,
                 bias: bool = False):
    """Return a pytree of string labels matching ``params``' structure.

    Top-level param scopes are: backbone / add_on / intermediate /
    classification (see models/pipnet.py).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    labels = {}

    def label_of(keypath):
        names = [getattr(k, "key", str(k)) for k in keypath]
        scope = names[0]
        if scope == "backbone":
            return _label_backbone_leaf(names[1:], net, use_mid_layers,
                                        num_stages)
        if scope == "add_on":
            return "add_on"
        if scope == "intermediate":
            return "intermediate" if train_intermediate else "frozen"
        if scope == "pool":
            return "frozen"
        if scope == "classification":
            leaf_name = names[-1]
            if leaf_name == "weight":
                return "cls_weight"
            if leaf_name == "bias":
                return "cls_bias" if bias else "frozen"
            return "frozen"  # normalization multiplier (args.py:300-301)
        return "frozen"

    leaves_labels = [label_of(kp) for kp, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, leaves_labels)


# ---------------------------------------------------------------------------
# LR schedules (host-side floats; exact torch closed forms)
# ---------------------------------------------------------------------------
def cosine_lr(base_lr: float, step: int, total_steps: int,
              eta_min: float = 0.0) -> float:
    """torch.optim.lr_scheduler.CosineAnnealingLR closed form."""
    if total_steps <= 0:
        return base_lr
    t = min(step, total_steps)
    return eta_min + (base_lr - eta_min) * (
        1 + math.cos(math.pi * t / total_steps)) / 2


def warm_restart_lr(base_lr: float, frac_epoch: float, t_0: int,
                    eta_min: float = 0.001) -> float:
    """torch CosineAnnealingWarmRestarts (T_mult=1) at a fractional epoch."""
    t_cur = math.fmod(frac_epoch, t_0)
    return eta_min + (base_lr - eta_min) * (
        1 + math.cos(math.pi * t_cur / t_0)) / 2


# ---------------------------------------------------------------------------
# Phase-masked AdamW (torch semantics)
# ---------------------------------------------------------------------------
def adamw_init(params):
    """State: first/second moments + per-leaf step count (a frozen-then-
    unfrozen param starts stepping from 0, like a torch param that only
    enters the optimizer once it has grads)."""
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    steps = jax.tree_util.tree_map(
        lambda p: jnp.zeros((), jnp.int32), params)
    return {"mu": zeros, "nu": jax.tree_util.tree_map(jnp.zeros_like, params),
            "step": steps}


def adamw_update(params, grads, state, labels, lr_by_label: Dict[str, jnp.ndarray],
                 mask_by_label: Dict[str, jnp.ndarray],
                 wd_by_label: Dict[str, float],
                 b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """One AdamW step with per-label lr / trainability mask / weight decay.

    ``labels`` is a static pytree of strings; ``lr_by_label`` and
    ``mask_by_label`` are dicts of runtime scalars (traced — changing lr or
    phase never recompiles). Masked leaves (mask 0.0) are completely inert.

    torch AdamW update (decoupled wd):
      p <- p * (1 - lr*wd);  p <- p - lr * mu_hat / (sqrt(nu_hat) + eps)
    """
    def leaf(p, g, mu, nu, step, label):
        if label == "frozen":
            return p, mu, nu, step
        lr = lr_by_label[label]
        mask = mask_by_label[label]
        wd = wd_by_label.get(label, 0.0)
        g = g.astype(jnp.float32)
        new_step = step + (mask > 0).astype(jnp.int32)
        t = jnp.maximum(new_step, 1).astype(jnp.float32)
        new_mu = b1 * mu + (1 - b1) * g
        new_nu = b2 * nu + (1 - b2) * (g * g)
        mu_hat = new_mu / (1 - b1 ** t)
        nu_hat = new_nu / (1 - b2 ** t)
        new_p = p * (1 - lr * wd)
        new_p = new_p - lr * mu_hat / (jnp.sqrt(nu_hat) + eps)
        keep = mask > 0
        return (
            jnp.where(keep, new_p, p),
            jnp.where(keep, new_mu, mu),
            jnp.where(keep, new_nu, nu),
            new_step,
        )

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_mu = treedef.flatten_up_to(state["mu"])
    flat_nu = treedef.flatten_up_to(state["nu"])
    flat_st = treedef.flatten_up_to(state["step"])
    flat_lb = treedef.flatten_up_to(labels)

    out = [leaf(*args) for args in
           zip(flat_p, flat_g, flat_mu, flat_nu, flat_st, flat_lb)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_state = {
        "mu": treedef.unflatten([o[1] for o in out]),
        "nu": treedef.unflatten([o[2] for o in out]),
        "step": treedef.unflatten([o[3] for o in out]),
    }
    return new_p, new_state
