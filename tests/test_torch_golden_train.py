"""Torch-golden TRAINING-TRAJECTORY parity.

The capstone of the golden harness: run the SAME multi-step training —
identical init, identical data order, identical optimizer grouping —
in plain torch (golden modules + torch.optim.AdamW) and in this
framework (make_train_step), across a pretrain-mix segment and a
main-mix segment with the post-step sparsity projection, and require
the loss trajectories and final parameters to agree.

This upgrades "losses match / grads match / AdamW matches" (tested
separately) into the composed statement the north-star asks for:
training itself is numerically the reference's (deterministic paths;
activation=softmax so no RNG enters).

Reference loop semantics: pipnet/train.py:8-163 (zero_grad, loss,
backward, both optimizer steps, projection), main.py:238-437 (phase
loss mixes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from count_pipnet_tpu.models import convert_torchvision_convnext
from count_pipnet_tpu.models.convnext import ConvNeXtFeatures
from count_pipnet_tpu.models.pipnet import CountPIPNet
from count_pipnet_tpu.train.optim import label_params, adamw_init
from count_pipnet_tpu.train.steps import make_train_step

from test_torch_golden import synth_sd, t_convnext_forward, t_count_head
from test_torch_golden_grads import t_calculate_loss

P, NC, M = 6, 3, 3
IMG = 32
LR_BLOCK, LR_CLS = 1e-3, 5e-3  # reference-scale
EPS_ADAM = 1e-8  # torch default
COEFF = 0.1
MULT = 2.0


def _setup():
    rng = np.random.default_rng(17)
    sd_full = synth_sd(rng)
    sd = {k: v for k, v in sd_full.items()
          if k.startswith(("features.0.", "features.1."))}

    # stochastic depth OFF: the golden torch modules are deterministic
    # (torchvision applies droppath only in train mode; parity of the
    # droppath mechanism itself is covered by its unit tests)
    backbone = ConvNeXtFeatures(stride_threshold=100, num_stages=1,
                                stochastic_depth_prob=0.0)
    model = CountPIPNet(
        num_classes=NC, num_prototypes=P, backbone=backbone,
        max_count=M, use_ste=True, activation="softmax",
        intermediate_type="onehot", num_features=P)
    x0 = jnp.zeros((2, IMG, IMG, 3), jnp.float32)
    params = dict(model.init({"params": jax.random.PRNGKey(0)},
                             x0)["params"])
    params["backbone"] = convert_torchvision_convnext(sd, num_stages=1)
    clf = dict(params["classification"])
    clf["multiplier"] = jnp.full_like(clf["multiplier"], MULT)
    # positive weights so the projection has something to shrink
    clf["weight"] = jnp.abs(clf["weight"]) + 0.5
    params["classification"] = clf

    # torch copies of every trainable tensor
    tsd = {k: v.clone().requires_grad_(True) for k, v in sd.items()}
    k = np.asarray(params["add_on"]["conv1x1"]["kernel"])
    conv_w = torch.tensor(
        np.transpose(k[0, 0], (1, 0))[:, :, None, None]).requires_grad_(
        True)
    conv_b = torch.tensor(np.asarray(
        params["add_on"]["conv1x1"]["bias"])).requires_grad_(True)
    clf_w = torch.tensor(np.asarray(
        params["classification"]["weight"])).requires_grad_(True)

    # fixed two-view batches (no augmentation; deterministic order)
    B = 4
    batches = []
    for s in range(3):
        r = np.random.default_rng(100 + s)
        x1 = r.normal(size=(B, IMG, IMG, 3)).astype(np.float32) * 0.5
        x2 = r.normal(size=(B, IMG, IMG, 3)).astype(np.float32) * 0.5
        ys = (r.integers(0, NC, size=B)).astype(np.int32)
        batches.append((x1, x2, ys))
    return model, params, sd, tsd, conv_w, conv_b, clf_w, batches


def _torch_forward(tsd, conv_w, conv_b, clf_w, x_nhwc):
    x = torch.tensor(np.transpose(x_nhwc, (0, 3, 1, 2)))
    feats = t_convnext_forward(x, tsd, 1, 100)
    return t_count_head(feats.permute(0, 2, 3, 1), conv_w, conv_b,
                        clf_w, M, False)


def _phase_sched(phase):
    if phase == "pretrain":
        aw, tw, cw, pre, fin, proj = 0.5, 5.0, 0.0, 1.0, 0.0, 0.0
    else:
        aw, tw, cw, pre, fin, proj = 5.0, 2.0, 2.0, 0.0, 0.0, 1.0
    lr = {"backbone": 0.0, "to_freeze": LR_BLOCK, "to_train": LR_BLOCK,
          "add_on": LR_BLOCK * 10, "cls_weight": LR_CLS, "cls_bias": 0.0,
          "intermediate": 0.0}
    mask_on = ({"to_freeze", "to_train", "add_on"} if phase == "pretrain"
               else {"to_freeze", "to_train", "add_on", "cls_weight"})
    mask = {k: (1.0 if k in mask_on else 0.0) for k in lr}
    return {"lr": {k: jnp.float32(v) for k, v in lr.items()},
            "mask": {k: jnp.float32(v) for k, v in mask.items()},
            "align_w": jnp.float32(aw), "tanh_w": jnp.float32(tw),
            "class_w": jnp.float32(cw), "pretrain": jnp.float32(pre),
            "finetune": jnp.float32(fin), "tau": jnp.float32(1.0),
            "project": jnp.float32(proj)}, (aw, tw, cw, pre, fin)


def test_training_trajectory_matches_torch():
    model, params, sd, tsd, conv_w, conv_b, clf_w, batches = _setup()

    labels = label_params(params, "convnext_tiny_26", use_mid_layers=True,
                          num_stages=1)
    step = make_train_step(model, labels, is_count_pipnet=True,
                           enforce_weight_sparsity=True,
                           tanh_loss_coeff=COEFF, adam_eps=EPS_ADAM,
                           donate=False)
    opt_state = adamw_init(params)

    # torch optimizer: reference grouping (util/args.py:273-323) with the
    # same per-group LRs; pretrain freezes the classifier by zeroing grads
    stem = [v for k, v in tsd.items() if k.startswith("features.0.")]
    stage1 = [v for k, v in tsd.items() if k.startswith("features.1.")]
    opt_t = torch.optim.AdamW([
        {"params": stem, "lr": LR_BLOCK},
        {"params": stage1, "lr": LR_BLOCK},
        {"params": [conv_w, conv_b], "lr": LR_BLOCK * 10},
        {"params": [clf_w], "lr": LR_CLS},
    ], weight_decay=0.0, eps=EPS_ADAM)

    plan = [("pretrain", 4), ("main", 6)]
    losses_j, losses_t = [], []
    bi = 0
    for phase, nsteps in plan:
        sched, (aw, tw, cw, pre, fin) = _phase_sched(phase)
        for _ in range(nsteps):
            x1, x2, ys = batches[bi % len(batches)]
            bi += 1

            # ---- torch step
            opt_t.zero_grad()
            proto, pooled, out = _torch_forward(
                tsd, conv_w, conv_b, clf_w, np.concatenate([x1, x2]))
            loss_t = t_calculate_loss(
                proto, pooled, out, torch.tensor(ys.astype(np.int64)),
                aw, tw, cw, MULT, pre > 0, fin > 0, COEFF)
            loss_t.backward()
            if phase == "pretrain":
                clf_w.grad = None  # requires_grad staging, main.py:243
            opt_t.step()
            if phase == "main":  # projection, train.py:132-138
                with torch.no_grad():
                    clf_w.data = torch.clamp(clf_w.data - 1e-3, min=0)
            losses_t.append(float(loss_t.detach()))

            # ---- framework step
            params, _, opt_state, metrics = step(
                params, {}, opt_state, (x1, x2, ys),
                jax.random.PRNGKey(0), sched)
            losses_j.append(float(metrics["loss"]))

    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-3, atol=2e-4)
    # the pretrain segment must actually descend (both sides agree)
    assert losses_t[3] < losses_t[0]
    assert losses_j[3] < losses_j[0]

    w_j = np.asarray(params["classification"]["weight"])
    np.testing.assert_allclose(w_j, clf_w.detach().numpy(),
                               rtol=5e-3, atol=5e-4)
    g_stem = np.asarray(
        params["backbone"]["features_0"]["conv"]["kernel"])
    golden_stem = np.transpose(
        tsd["features.0.0.weight"].detach().numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(g_stem, golden_stem, rtol=5e-3,
                               atol=5e-4)
