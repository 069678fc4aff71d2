"""Loss functions for PIP-Net / Count-PIPNet training.

Reference: pipnet/train.py:165-265. All functions are pure and jit-friendly;
phase logic (pretrain/finetune) is expressed through runtime float weights so
one compiled train step covers every training phase.

Layout note: proto_features are NHWC ([B, H, W, P]) — the TPU-native layout —
so the "flatten patches" step for the align loss is a plain reshape instead of
the reference's permute+flatten (train.py:173-174).
"""

import jax
import jax.numpy as jnp

__all__ = ["align_loss", "tanh_loss", "class_loss", "calculate_loss",
           "uniform_loss"]


def uniform_loss(x, t=2.0, eps=1e-10):
    """Hypersphere uniformity regularizer — present but unused in the
    reference (train.py:253-256), kept for capability parity:
    log(mean(exp(-t * pdist(x)^2)) + eps)."""
    sq = jnp.sum(x * x, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    n = x.shape[0]
    iu = jnp.triu_indices(n, k=1)
    return jnp.log(jnp.mean(jnp.exp(-t * d2[iu])) + eps)


def align_loss(inputs, targets, eps=1e-12):
    """Contrastive patch alignment: -log(<z1, z2>) over all patch embeddings.

    Args:
      inputs: [N, P] patch softmax embeddings (gradients flow).
      targets: [N, P] patch embeddings of the other view (caller should pass
        ``jax.lax.stop_gradient(targets)``).

    Reference: pipnet/train.py:259-265.
    """
    dots = jnp.sum(inputs * targets, axis=-1)
    return -jnp.log(dots + eps).mean()


def tanh_loss(pooled1, pooled2, coeff=1.0, eps=1e-8):
    """"Every prototype should fire somewhere in the batch" regularizer.

    Args:
      pooled1, pooled2: [B, P] pooled activations (counts for Count-PIPNet,
        max-pool scores for PIP-Net), one per view.
      coeff: linear normalization coefficient applied before tanh (the
        reference applies it only for Count-PIPNet, train.py:178-191; pass
        1.0 for PIP-Net).
      eps: numerical floor inside the log (the reference calls
        calculate_loss with EPS=1e-8, train.py:90).

    Reference: pipnet/train.py:194-195.
    """
    t1 = jnp.log(jnp.tanh(jnp.sum(coeff * pooled1, axis=0)) + eps).mean()
    t2 = jnp.log(jnp.tanh(jnp.sum(coeff * pooled2, axis=0)) + eps).mean()
    return -(t1 + t2) / 2.0


def class_loss(out, ys, normalization_multiplier, enforce_weight_sparsity=True,
               class_weights=None):
    """NLL over log_softmax(log1p(out ** multiplier)).

    Args:
      out: [N, C] raw classifier outputs (both views concatenated).
      ys: [N] int labels.
      normalization_multiplier: scalar (the classifier's multiplier param).
      enforce_weight_sparsity: when True (reference default) the softmax
        input is log1p(out**multiplier) (train.py:211-214), else raw out.
      class_weights: optional [C] weights (``--weighted_loss``); NLLLoss with
        weights computes sum(w_y * nll) / sum(w_y).

    Reference: pipnet/train.py:210-216 with criterion nn.NLLLoss(mean).
    """
    if enforce_weight_sparsity:
        softmax_inputs = jnp.log1p(out ** normalization_multiplier)
    else:
        softmax_inputs = out
    logp = jax.nn.log_softmax(softmax_inputs, axis=1)
    nll = -jnp.take_along_axis(logp, ys[:, None], axis=1)[:, 0]
    if class_weights is not None:
        w = class_weights[ys]
        return jnp.sum(w * nll) / jnp.sum(w)
    return nll.mean()


def calculate_loss(
    proto_features,
    pooled,
    out,
    ys1,
    align_pf_weight,
    t_weight,
    cl_weight,
    normalization_multiplier,
    pretrain_w,
    finetune_w,
    is_count_pipnet=False,
    eps=1e-8,
    enforce_weight_sparsity=True,
    tanh_loss_coeff=1.0,
    class_weights=None,
):
    """Combined loss over a two-view batch. Reference: pipnet/train.py:165-250.

    Args:
      proto_features: [2B, H, W, P] (views concatenated, NHWC).
      pooled: [2B, P].
      out: [2B, C].
      ys1: [B] labels (duplicated internally for the two views).
      align_pf_weight, t_weight, cl_weight: loss component weights
        (train.py:52-61 schedule, passed as runtime scalars).
      pretrain_w: 1.0 during pretraining else 0.0 — gates the class loss.
      finetune_w: 1.0 during finetuning else 0.0 — gates align+tanh.

    Returns:
      (loss, acc, components) where components holds raw and weighted parts.
    """
    pf1, pf2 = jnp.split(proto_features, 2, axis=0)
    pooled1, pooled2 = jnp.split(pooled, 2, axis=0)
    ys = jnp.concatenate([ys1, ys1])

    p = proto_features.shape[-1]
    embv1 = pf1.reshape(-1, p)
    embv2 = pf2.reshape(-1, p)

    a_loss = (
        align_loss(embv1, jax.lax.stop_gradient(embv2))
        + align_loss(embv2, jax.lax.stop_gradient(embv1))
    ) / 2.0

    coeff = tanh_loss_coeff if is_count_pipnet else 1.0
    t_loss = tanh_loss(pooled1, pooled2, coeff=coeff, eps=eps)

    c_loss = class_loss(
        out, ys, normalization_multiplier,
        enforce_weight_sparsity=enforce_weight_sparsity,
        class_weights=class_weights,
    )

    # Phase gating as arithmetic (train.py:206-223):
    #   not finetune: loss = aw*align + tw*tanh ;  not pretrain: loss += cw*class
    #   finetune: loss = cw*class only.
    not_finetune = 1.0 - finetune_w
    not_pretrain = 1.0 - pretrain_w
    loss = not_finetune * (align_pf_weight * a_loss + t_weight * t_loss)
    loss = loss + not_pretrain * cl_weight * c_loss

    preds = jnp.argmax(out, axis=1)
    acc = jnp.mean((preds == ys).astype(jnp.float32)) * not_pretrain

    components = {
        "align": a_loss,
        "align_weighted": a_loss * align_pf_weight,
        "tanh": t_loss,
        "tanh_weighted": t_loss * t_weight,
        "class": c_loss * not_pretrain,
        "class_weighted": c_loss * cl_weight * not_pretrain,
    }
    return loss, acc, components
