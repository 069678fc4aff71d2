"""Torch-golden GRADIENT parity for the training objective.

test_torch_golden.py establishes forward parity (backbone, converter,
count head) and input-gradient parity through the STE chain. This file
closes the remaining golden gap: **parameter gradients of the full
training loss** — the reference's align / tanh / class losses with their
exact detach semantics (pipnet/train.py:165-265) — computed by torch
autograd on a plain-torch re-implementation and by jax.grad on this
framework, must agree numerically:

* head-level: d(loss)/d{add-on conv, classifier weight} through the
  softmax -> count -> STE round/clamp -> modified-onehot chain, for both
  the main-phase and pretrain-phase loss mixes;
* backbone-level: d(loss)/d(every backbone param) through a converted
  2-stage stride-surgery ConvNeXt. The converter is pure layout
  (transposes only), so feeding the torch grad state_dict through
  ``convert_torchvision_convnext`` yields the golden grads in flax
  layout directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from count_pipnet_tpu.models import convert_torchvision_convnext
from count_pipnet_tpu.models.convnext import ConvNeXtFeatures
from count_pipnet_tpu.ops.losses import calculate_loss

from test_torch_golden import (
    _head_setup, t_count_head, t_convnext_forward, synth_sd,
)

RTOL = 2e-4
ATOL = 2e-4


# ---------------------------------------------------------------------------
# Golden torch loss (re-derived from reference pipnet/train.py:165-265)
# ---------------------------------------------------------------------------
def t_align_loss(inputs, targets, eps=1e-12):
    return -torch.log((inputs * targets.detach()).sum(-1) + eps).mean()


def t_calculate_loss(proto, pooled, out, ys1, aw, tw, cw, mult,
                     pretrain, finetune, coeff, eps=1e-8):
    pf1, pf2 = proto.chunk(2)
    p = proto.shape[-1]
    emb1 = pf1.reshape(-1, p)
    emb2 = pf2.reshape(-1, p)
    a_loss = (t_align_loss(emb1, emb2) + t_align_loss(emb2, emb1)) / 2.0

    p1, p2 = pooled.chunk(2)
    t1 = torch.log(torch.tanh((coeff * p1).sum(0)) + eps).mean()
    t2 = torch.log(torch.tanh((coeff * p2).sum(0)) + eps).mean()
    t_loss = -(t1 + t2) / 2.0

    ys = torch.cat([ys1, ys1])
    softmax_in = torch.log1p(out ** mult)
    c_loss = F.nll_loss(F.log_softmax(softmax_in, dim=1), ys)

    loss = 0.0
    if not finetune:
        loss = aw * a_loss + tw * t_loss
    if not pretrain:
        loss = loss + cw * c_loss
    return loss


def _two_view_feats(seed=5):
    rng = np.random.default_rng(seed)
    B, H, W, C = 4, 5, 5, 8
    f1 = rng.normal(size=(B, H, W, C)).astype(np.float32)
    f2 = rng.normal(size=(B, H, W, C)).astype(np.float32)
    ys = (np.arange(B) % 3).astype(np.int64)
    return f1, f2, ys


def _head_loss_grads(phase):
    """Returns (jax_grads, torch_grads) for (conv_w, conv_b, clf_w), in
    FLAX layout, under the given phase's loss mix."""
    model, params, _, conv_w, conv_b, clf_w, M = _head_setup()
    f1, f2, ys = _two_view_feats()
    mult = 2.0
    if phase == "main":
        aw, tw, cw, pre, fin = 5.0, 2.0, 2.0, False, False
    else:  # pretrain
        aw, tw, cw, pre, fin = 0.5, 5.0, 0.0, True, False
    coeff = 0.1

    # --- torch side
    cwt = conv_w.clone().requires_grad_(True)
    cbt = conv_b.clone().requires_grad_(True)
    wt = clf_w.clone().requires_grad_(True)
    x = torch.tensor(np.concatenate([f1, f2]))
    proto, pooled, out = t_count_head(x, cwt, cbt, wt, M, False)
    loss_t = t_calculate_loss(proto, pooled, out, torch.tensor(ys),
                              aw, tw, cw, mult, pre, fin, coeff)
    loss_t.backward()
    # conv kernel torch [P, C, 1, 1] -> flax [1, 1, C, P]
    g_conv = np.transpose(cwt.grad.numpy()[:, :, 0, 0], (1, 0))[None, None]
    # torch autograd leaves .grad as None for params the loss never
    # touches (classifier in pretrain)
    g_clf = None if wt.grad is None else wt.grad.numpy()
    torch_grads = (g_conv, cbt.grad.numpy(), g_clf)

    # --- jax side
    def loss_fn(p):
        proto, pooled, out = model.apply(
            {"params": p}, jnp.asarray(np.concatenate([f1, f2])))
        loss, _, _ = calculate_loss(
            proto, pooled, out, jnp.asarray(ys, jnp.int32),
            aw, tw, cw, mult, 1.0 if pre else 0.0, 1.0 if fin else 0.0,
            is_count_pipnet=True, enforce_weight_sparsity=True,
            tanh_loss_coeff=coeff)
        return loss, loss

    grads, loss_j = jax.grad(loss_fn, has_aux=True)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=1e-5)
    jax_grads = (np.asarray(grads["add_on"]["conv1x1"]["kernel"]),
                 np.asarray(grads["add_on"]["conv1x1"]["bias"]),
                 np.asarray(grads["classification"]["weight"]))
    return jax_grads, torch_grads


class TestTrainingLossGrads:
    def test_main_phase_param_grads(self):
        jax_g, torch_g = _head_loss_grads("main")
        for a, b in zip(jax_g, torch_g):
            np.testing.assert_allclose(a, b, rtol=RTOL, atol=ATOL)

    def test_pretrain_phase_param_grads(self):
        """Pretrain mix (class loss gated off): add-on grads must match
        and the classifier grad must be exactly zero on both sides."""
        jax_g, torch_g = _head_loss_grads("pretrain")
        for a, b in zip(jax_g[:2], torch_g[:2]):
            np.testing.assert_allclose(a, b, rtol=RTOL, atol=ATOL)
        assert np.all(jax_g[2] == 0.0)
        assert torch_g[2] is None or np.all(torch_g[2] == 0.0)

    def test_align_detach_semantics(self):
        """The align loss detaches the OTHER view per side
        (train.py:173-176). A golden without detach diverges — guard that
        our grads match the detach version, not the plain symmetric one."""
        model, params, _, conv_w, conv_b, clf_w, M = _head_setup()
        f1, f2, ys = _two_view_feats(seed=9)
        x = torch.tensor(np.concatenate([f1, f2]))

        def torch_align(detach):
            cwt = conv_w.clone().requires_grad_(True)
            proto, _, _ = t_count_head(x, cwt, conv_b, clf_w, M, False)
            pf1, pf2 = proto.chunk(2)
            p = proto.shape[-1]
            e1, e2 = pf1.reshape(-1, p), pf2.reshape(-1, p)
            if detach:
                loss = (t_align_loss(e1, e2) + t_align_loss(e2, e1)) / 2
            else:
                loss = -torch.log((e1 * e2).sum(-1) + 1e-12).mean()
            loss.backward()
            return cwt.grad.numpy()

        def loss_fn(p):
            proto, pooled, out = model.apply(
                {"params": p}, jnp.asarray(np.concatenate([f1, f2])))
            loss, _, _ = calculate_loss(
                proto, pooled, out, jnp.asarray(ys, jnp.int32),
                1.0, 0.0, 0.0, 2.0, 0.0, 0.0, is_count_pipnet=True,
                tanh_loss_coeff=0.1)
            return loss

        g = jax.grad(loss_fn)(params)["add_on"]["conv1x1"]["kernel"]
        g = np.asarray(g)[0, 0]

        g_detach = np.transpose(torch_align(True)[:, :, 0, 0], (1, 0))
        g_plain = np.transpose(torch_align(False)[:, :, 0, 0], (1, 0))
        np.testing.assert_allclose(g, g_detach, rtol=RTOL, atol=ATOL)
        assert not np.allclose(g, g_plain, rtol=1e-2, atol=1e-3)


class TestBackboneGrads:
    def test_converted_backbone_param_grads(self):
        """d(loss)/d(param) for EVERY param of a 2-stage stride-surgery
        backbone: torch autograd grads, converted to flax layout through
        the (layout-only) converter, vs jax.grad on the flax module."""
        rng = np.random.default_rng(33)
        sd = synth_sd(rng)
        x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32) * 0.5
        num_stages, thr = 2, 100

        # restrict to the params the 2-stage truncation uses
        used = {k: v for k, v in sd.items()
                if k.startswith(("features.0.", "features.1.",
                                 "features.2."))}
        for v in used.values():
            v.requires_grad_(True)

        out_t = t_convnext_forward(
            torch.tensor(np.transpose(x, (0, 3, 1, 2))), used,
            num_stages, thr)
        v_proj = torch.tensor(np.random.default_rng(7).normal(
            size=tuple(out_t.shape)).astype(np.float32))
        (out_t * v_proj).sum().backward()
        grad_sd = {k: v.grad for k, v in used.items()}
        golden = convert_torchvision_convnext(grad_sd,
                                              num_stages=num_stages)

        converted = convert_torchvision_convnext(used,
                                                 num_stages=num_stages)
        model = ConvNeXtFeatures(stride_threshold=thr,
                                 num_stages=num_stages)
        vj = jnp.asarray(np.transpose(v_proj.numpy(), (0, 2, 3, 1)))

        def loss_fn(p):
            feats = model.apply({"params": p}, jnp.asarray(x))
            return jnp.sum(feats * vj)

        grads = jax.grad(loss_fn)(converted)

        flat_g, _ = jax.tree_util.tree_flatten_with_path(grads)
        flat_ref = dict(jax.tree_util.tree_flatten_with_path(golden)[0])
        assert len(flat_g) >= 20  # every stem/block/downsample param
        for path, g in flat_g:
            ref = flat_ref[path]
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(ref), rtol=5e-4, atol=5e-4,
                err_msg=str(path))
