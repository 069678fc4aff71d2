"""Jitted train/eval steps.

One compiled train step covers every training phase of the reference loop
(main.py:238-437, train.py:8-163): phase structure arrives as a small dict of
runtime scalars (`sched`) — loss weights, per-label learning rates,
per-label trainability masks, gumbel tau, projection enable — so pretrain /
finetune / freeze-schedule transitions never recompile. Inputs are
batch-sharded over a data mesh; params/optimizer state replicated; XLA
inserts the gradient all-reduce.

Scalar schedule keys:
  lr: backbone, to_freeze, to_train, add_on, cls_weight, cls_bias,
      intermediate (reference: backbone lr_net, freeze/train lr_block,
      add-on lr_block*10, classifier lr; util/args.py:307-323)
  mask: same keys, 1.0 = trainable this step (requires_grad equivalent,
      main.py:238-253,333-390) — already multiplied by "which optimizer
      steps this phase" (train.py:116-124).
  loss: align_w, tanh_w, class_w, pretrain (0/1), finetune (0/1)
      (train.py:52-61).
  tau: gumbel temperature (main.py:264-290 annealing).
  project: 1.0 -> post-step projection w<-relu(w-1e-3), multiplier>=1,
      bias>=0 (train.py:132-138).
"""


from typing import Dict, FrozenSet

import jax
import jax.numpy as jnp

from ..ops.losses import calculate_loss
from .optim import adamw_update, NET_LABELS, CLASSIFIER_LABELS

__all__ = ["make_train_step", "make_eval_step", "project_classifier",
           "init_schedule_scalars"]


def init_schedule_scalars():
    """A fully-populated sched dict (all zeros) with the right keys."""
    lr = {k: 0.0 for k in NET_LABELS + CLASSIFIER_LABELS}
    mask = {k: 0.0 for k in NET_LABELS + CLASSIFIER_LABELS}
    return {
        "lr": lr, "mask": mask,
        "align_w": 0.0, "tanh_w": 0.0, "class_w": 0.0,
        "pretrain": 0.0, "finetune": 0.0,
        "tau": 1.0, "project": 0.0,
    }


def project_classifier(params, enable):
    """Sparsity projection after each step (reference train.py:132-138):
    weight <- clamp(weight - 1e-3, min=0); multiplier <- max(multiplier, 1);
    bias <- max(bias, 0). ``enable`` is a runtime 0/1 scalar."""
    clf = dict(params["classification"])
    w = clf["weight"]
    clf["weight"] = jnp.where(enable > 0, jnp.maximum(w - 1e-3, 0.0), w)
    m = clf["multiplier"]
    clf["multiplier"] = jnp.where(enable > 0, jnp.maximum(m, 1.0), m)
    if "bias" in clf:
        b = clf["bias"]
        clf["bias"] = jnp.where(enable > 0, jnp.maximum(b, 0.0), b)
    new_params = dict(params)
    new_params["classification"] = clf
    return new_params


def make_train_step(model, labels, *, is_count_pipnet: bool,
                    enforce_weight_sparsity: bool = True,
                    tanh_loss_coeff: float = 1.0,
                    weight_decay: float = 0.0,
                    class_weights=None,
                    frozen_labels: FrozenSet[str] = frozenset(),
                    adam_eps: float = 1e-8,
                    donate: bool = True):
    """Build the jitted train step.

    Args:
      model: PIPNet or CountPIPNet linen module.
      labels: static label pytree from optim.label_params.
      is_count_pipnet / enforce_weight_sparsity / tanh_loss_coeff /
      weight_decay / class_weights: static per-run config.
      frozen_labels: STATIC set of labels whose params get
        ``stop_gradient`` inside the loss. The reference never computes
        gradients for ``requires_grad=False`` params (torch autograd DCE);
        the runtime-scalar mask alone only makes the *update* inert while
        the full backward still runs. Baking the phase's frozen set in
        statically lets XLA dead-code the frozen wgrads — and when every
        label below some depth is frozen (pretrain / freeze_epochs /
        finetune, main.py:238-253,333-390), the entire backward below
        that depth disappears. One compiled step per distinct set
        (<= 4 per run); numerics of the surviving gradients are
        unchanged (verified by tests/test_phase_dce.py).

    Returns:
      train_step(params, model_state, opt_state, batch, rng, sched)
        -> (params, model_state, opt_state, metrics)
      where batch = (xs1, xs2, ys) NHWC float32 inputs.
    """
    wd_by_label = {k: 0.0 for k in NET_LABELS + CLASSIFIER_LABELS}
    wd_by_label["cls_weight"] = weight_decay
    wd_by_label["intermediate"] = weight_decay
    cw = None if class_weights is None else jnp.asarray(class_weights)
    frozen_labels = frozenset(frozen_labels)

    def step(params, model_state, opt_state, batch, rng, sched):
        xs1, xs2, ys = batch
        x = jnp.concatenate([xs1, xs2])
        g_rng, d_rng = jax.random.split(rng)

        def loss_fn(p):
            if frozen_labels:
                p = jax.tree_util.tree_map(
                    lambda leaf, lab: (jax.lax.stop_gradient(leaf)
                                       if lab in frozen_labels else leaf),
                    p, labels)
            variables = {"params": p, **model_state}
            (proto, pooled, out), updates = model.apply(
                variables, x, train=True, tau=sched["tau"],
                rngs={"gumbel": g_rng, "droppath": d_rng},
                mutable=["batch_stats"])
            mult = p["classification"]["multiplier"][0]
            loss, acc, comps = calculate_loss(
                proto.astype(jnp.float32), pooled.astype(jnp.float32),
                out.astype(jnp.float32), ys,
                sched["align_w"], sched["tanh_w"], sched["class_w"],
                mult, sched["pretrain"], sched["finetune"],
                is_count_pipnet=is_count_pipnet,
                enforce_weight_sparsity=enforce_weight_sparsity,
                tanh_loss_coeff=tanh_loss_coeff,
                class_weights=cw)
            return loss, (acc, comps, updates)

        (loss, (acc, comps, model_updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)

        new_params, new_opt_state = adamw_update(
            params, grads, opt_state, labels,
            lr_by_label=sched["lr"], mask_by_label=sched["mask"],
            wd_by_label=wd_by_label, eps=adam_eps)

        project = sched["project"] * (1.0 - sched["pretrain"]) * (
            1.0 if enforce_weight_sparsity else 0.0)
        new_params = project_classifier(new_params, project)

        new_model_state = dict(model_state)
        if "batch_stats" in model_updates:
            new_model_state["batch_stats"] = model_updates["batch_stats"]

        metrics = {"loss": loss, "acc": acc, **comps}
        return new_params, new_model_state, new_opt_state, metrics

    if donate:
        return jax.jit(step, donate_argnums=(0, 1, 2))
    return jax.jit(step)


def make_eval_step(model, *, num_classes: int):
    """Jitted inference step returning per-batch evaluation statistics.

    Device-side equivalents of the reference eval loop body
    (pipnet/test.py:67-146): predictions, abstention count, weighted-score
    local explanation sizes, per-class prototype activity, almost-nonzero
    counts, top-1/top-5 correctness, and a batch confusion matrix via one
    scatter-add.

    Args:
      model: the linen module.

    Returns:
      eval_step(params, model_state, xs, ys, class_proto_weights, rng, tau)
        -> dict of batch stats. ``class_proto_weights`` is [C, P]: virtual
        weights for Count-PIPNet (importance matrix) or raw classifier
        weights for PIP-Net (test.py:51-64).
    """

    def step(params, model_state, xs, ys, class_proto_weights, rng, tau):
        variables = {"params": params, **model_state}
        proto, pooled, out = model.apply(
            variables, xs, inference=True, train=False, tau=tau,
            rngs={"gumbel": rng})
        out = out.astype(jnp.float32)
        pooled = pooled.astype(jnp.float32)

        max_out, ys_pred = jnp.max(out, axis=1), jnp.argmax(out, axis=1)
        mult = params["classification"]["multiplier"][0]
        # AUC score input: amax(softmax(log1p(out**multiplier)))
        # (verified against reference test.py:78).
        pred_scores = jnp.max(
            jax.nn.softmax(jnp.log1p(out ** mult), axis=1), axis=1)
        abstained = jnp.sum(max_out == 0)

        # scores[c, b, p] = pooled[b, p] * W[c, p]  (test.py:85-95)
        scores = pooled[None, :, :] * class_proto_weights[:, None, :]
        relevant = jnp.abs(scores) > 1e-3
        any_class_sizes = jnp.sum(jnp.any(relevant, axis=0), axis=1)
        per_class_counts = jnp.sum(relevant, axis=2)        # [C, B]
        pred_class_sizes = jnp.take_along_axis(
            per_class_counts, ys_pred[None, :], axis=0)[0]  # [B]

        prototypes_per_class = jnp.sum(
            (jnp.mean(jnp.maximum(scores - 1e-3, 0.0), axis=1) > 0.0),
            axis=1).astype(jnp.float32)                     # [C]
        almost_nz = jnp.sum(jnp.abs(pooled) > 1e-3, axis=1)  # [B]

        # top-1 / top-5 (capped at num_classes, util/func.py:22-37)
        k = min(5, num_classes)
        topk = jax.lax.top_k(out, k)[1]                     # [B, k]
        correct_k = (topk == ys[:, None])
        top5 = jnp.any(correct_k, axis=1).astype(jnp.float32)

        cm = jnp.zeros((num_classes, num_classes), jnp.int32)
        cm = cm.at[ys, ys_pred].add(1)

        return {
            "ys_pred": ys_pred,
            "pred_scores": pred_scores,
            "abstained": abstained,
            "any_class_sizes_mean": jnp.mean(any_class_sizes.astype(
                jnp.float32)),
            "pred_class_sizes_mean": jnp.mean(pred_class_sizes.astype(
                jnp.float32)),
            "prototypes_per_class_mean": jnp.mean(prototypes_per_class),
            "almost_nz_mean": jnp.mean(almost_nz.astype(jnp.float32)),
            # top-1 is derived from the confusion matrix on the host
            # (exact under ragged final batches; train/eval.py)
            "top5_mean": jnp.mean(top5),
            "cm": cm,
            "pooled": pooled,
        }

    return jax.jit(step)
