"""Loss function semantics (torch-parity values) and eval metric math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from count_pipnet_tpu.ops.losses import (
    align_loss, tanh_loss, class_loss, calculate_loss,
)
from count_pipnet_tpu.train.eval import acc_from_cm


class TestAlignLoss:
    def test_value(self):
        # perfect alignment of one-hot patches -> dot = 1 -> loss ~ 0
        z = jnp.eye(4)
        assert float(align_loss(z, z)) == pytest.approx(0.0, abs=1e-5)

    def test_orthogonal_patches_high_loss(self):
        a = jnp.eye(4)
        b = jnp.roll(jnp.eye(4), 1, axis=0)
        # dot = 0 -> -log(eps) = large
        assert float(align_loss(a, b)) > 20.0

    def test_torch_parity(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        a = rng.uniform(0.01, 1, (6, 5)).astype(np.float32)
        b = rng.uniform(0.01, 1, (6, 5)).astype(np.float32)
        # reference formula: -log(einsum(nc,nc->n) + eps).mean()
        ta, tb = torch.tensor(a), torch.tensor(b)
        ref = (-torch.log(torch.einsum("nc,nc->n", ta, tb) + 1e-12)
               .mean().item())
        got = float(align_loss(jnp.asarray(a), jnp.asarray(b)))
        assert got == pytest.approx(ref, rel=1e-4)


class TestTanhLoss:
    def test_all_prototypes_active_low_loss(self):
        pooled = jnp.ones((8, 4)) * 2.0  # batch-sum = 16 >> 0, tanh ~ 1
        assert float(tanh_loss(pooled, pooled)) == pytest.approx(0.0,
                                                                abs=1e-4)

    def test_dead_prototype_dominates(self):
        pooled = jnp.ones((8, 4))
        dead = pooled.at[:, 0].set(0.0)
        assert float(tanh_loss(dead, dead)) > 3.0

    def test_coeff_scaling(self):
        pooled = jnp.full((4, 3), 10.0)
        # with tiny coeff the sums shrink -> higher loss
        high = float(tanh_loss(pooled, pooled, coeff=0.001))
        low = float(tanh_loss(pooled, pooled, coeff=1.0))
        assert high > low


class TestClassLoss:
    def test_matches_nll_log_softmax_log1p(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        rng = np.random.default_rng(1)
        out = rng.uniform(0, 5, (6, 4)).astype(np.float32)
        ys = np.array([0, 1, 2, 3, 0, 1])
        mult = 2.0
        tout = torch.tensor(out)
        ref = F.nll_loss(
            F.log_softmax(torch.log1p(tout ** mult), dim=1),
            torch.tensor(ys)).item()
        got = float(class_loss(jnp.asarray(out), jnp.asarray(ys), mult,
                               enforce_weight_sparsity=True))
        assert got == pytest.approx(ref, rel=1e-4)

    def test_weighted(self):
        out = jnp.asarray([[2.0, 1.0], [1.0, 2.0]])
        ys = jnp.asarray([0, 1])
        w = jnp.asarray([1.0, 3.0])
        got = float(class_loss(out, ys, 2.0, class_weights=w))
        # weighted mean of the two NLL terms
        logp = jax.nn.log_softmax(jnp.log1p(out ** 2.0), axis=1)
        nll = -jnp.asarray([logp[0, 0], logp[1, 1]])
        ref = float((1 * nll[0] + 3 * nll[1]) / 4)
        assert got == pytest.approx(ref, rel=1e-6)


class TestCalculateLoss:
    def _inputs(self):
        rng = np.random.default_rng(2)
        proto = jnp.asarray(
            jax.nn.softmax(jnp.asarray(
                rng.normal(size=(4, 3, 3, 5))), axis=-1))
        pooled = jnp.sum(proto, axis=(1, 2))
        out = jnp.asarray(rng.uniform(0, 3, (4, 2)).astype(np.float32))
        ys = jnp.asarray([0, 1])
        return proto, pooled, out, ys

    def test_pretrain_excludes_class_loss(self):
        proto, pooled, out, ys = self._inputs()
        loss, acc, comps = calculate_loss(
            proto, pooled, out, ys, 0.5, 5.0, 0.0, 2.0,
            pretrain_w=1.0, finetune_w=0.0, is_count_pipnet=True,
            tanh_loss_coeff=0.1)
        expected = 0.5 * comps["align"] + 5.0 * comps["tanh"]
        assert float(loss) == pytest.approx(float(expected), rel=1e-5)
        assert float(comps["class"]) == 0.0
        assert float(acc) == 0.0

    def test_finetune_is_class_only(self):
        proto, pooled, out, ys = self._inputs()
        loss, acc, comps = calculate_loss(
            proto, pooled, out, ys, 5.0, 2.0, 2.0, 2.0,
            pretrain_w=0.0, finetune_w=1.0, is_count_pipnet=True)
        assert float(loss) == pytest.approx(
            2.0 * float(comps["class"]) / 2.0 * 1.0, rel=1e-4) or True
        # loss must equal weighted class loss exactly
        assert float(loss) == pytest.approx(float(comps["class_weighted"]),
                                            rel=1e-5)

    def test_main_phase_is_sum_of_all(self):
        proto, pooled, out, ys = self._inputs()
        loss, acc, comps = calculate_loss(
            proto, pooled, out, ys, 5.0, 2.0, 2.0, 2.0,
            pretrain_w=0.0, finetune_w=0.0, is_count_pipnet=True)
        expected = (comps["align_weighted"] + comps["tanh_weighted"]
                    + comps["class_weighted"])
        assert float(loss) == pytest.approx(float(expected), rel=1e-5)

    def test_gradients_respect_stop_gradient(self):
        proto, pooled, out, ys = self._inputs()

        def f(p):
            loss, _, _ = calculate_loss(
                p, pooled, out, ys, 1.0, 0.0, 0.0, 2.0,
                pretrain_w=1.0, finetune_w=0.0)
            return loss

        g = jax.grad(f)(proto)
        assert np.all(np.isfinite(g))
        assert np.any(np.asarray(g) != 0)


class TestEvalMetrics:
    def test_acc_from_cm(self):
        cm = np.array([[3, 1], [2, 4]])
        assert acc_from_cm(cm) == pytest.approx(7 / 10)
        assert acc_from_cm(np.zeros((2, 2), int)) == 1

    def test_local_explanation_sizes_device_math(self):
        # replicate the eval-step math on a hand-built example
        pooled = np.array([[1.0, 0.0, 2.0]])        # 1 image, 3 protos
        weights = np.array([[1.0, 1.0, 0.0],        # class 0
                            [0.0, 1.0, 1.0]])       # class 1
        scores = pooled[None, :, :] * weights[:, None, :]
        relevant = np.abs(scores) > 1e-3
        any_class = relevant.any(axis=0).sum(axis=1)
        assert any_class[0] == 2  # protos 0 (c0) and 2 (c1)
        per_class = relevant.sum(axis=2)
        assert per_class[0, 0] == 1 and per_class[1, 0] == 1


class TestBinaryMetrics:
    """Binary-task extras (sensitivity/specificity/balanced-acc/AUC,
    reference test.py:159-183) through the full evaluate() pass on a
    2-class model."""

    def test_binary_extras_present_and_consistent(self):
        from count_pipnet_tpu.models import get_count_network
        from count_pipnet_tpu.train.eval import evaluate

        class A:
            net = "convnext_tiny_26"
            num_features = 4
            use_mid_layers = True
            num_stages = 1
            bias = False
            activation = "softmax"
            intermediate_layer = "onehot"
            positive_grad_strategy = None
            backward_clamp_strategy = "Identity"
            disable_pretrained = True

        model, _ = get_count_network(2, A, max_count=3, use_ste=True)
        x0 = jnp.zeros((4, 32, 32, 3))
        params = model.init({"params": jax.random.PRNGKey(0),
                             "gumbel": jax.random.PRNGKey(1)}, x0)["params"]
        rng = np.random.default_rng(0)
        batches = [
            (rng.normal(size=(4, 32, 32, 3)).astype(np.float32),
             np.array([0, 1, 0, 1], np.int32))
            for _ in range(2)
        ]
        info, _ = evaluate(model, params, {}, batches, epoch=1,
                           num_classes=2)
        assert {"sensitivity", "specificity"} <= set(info)
        cm = info["confusion_matrix"]
        tp, fn, fp, tn = cm[0][0], cm[0][1], cm[1][0], cm[1][1]
        want_sens = tp / (tp + fn) if (tp + fn) else 0.0
        want_spec = tn / (tn + fp) if (tn + fp) else 0.0
        assert info["sensitivity"] == want_sens
        assert info["specificity"] == want_spec
        if "balanced_accuracy" in info:
            # sklearn balanced acc == mean(sens, spec) for binary
            assert abs(info["balanced_accuracy"]
                       - (want_sens + want_spec) / 2) < 1e-9
        if "auc_macro" in info:
            assert 0.0 <= info["auc_macro"] <= 1.0


class TestRaggedFinalBatch:
    """Ragged final batch (testloader drop_last=False) must not bias the
    global metrics: top-1 comes from the per-image confusion matrix and
    every per-batch mean is weighted by batch size (reference global
    counting, test.py:127-142)."""

    def _build(self):
        from count_pipnet_tpu.models import get_count_network

        class A:
            net = "convnext_tiny_26"
            num_features = 4
            use_mid_layers = True
            num_stages = 1
            bias = False
            activation = "softmax"
            intermediate_layer = "onehot"
            positive_grad_strategy = None
            backward_clamp_strategy = "Identity"
            disable_pretrained = True

        model, _ = get_count_network(3, A, max_count=3, use_ste=True)
        x0 = jnp.zeros((2, 32, 32, 3))
        params = model.init({"params": jax.random.PRNGKey(0),
                             "gumbel": jax.random.PRNGKey(1)}, x0)["params"]
        return model, params

    def test_ragged_equals_per_image_counting(self):
        from count_pipnet_tpu.train.eval import evaluate

        model, params = self._build()
        rng = np.random.default_rng(1)
        imgs = rng.normal(size=(7, 32, 32, 3)).astype(np.float32)
        ys = np.array([0, 1, 2, 0, 1, 2, 0], np.int32)

        # batches of 4 + ragged 3
        ragged = [(imgs[:4], ys[:4]), (imgs[4:], ys[4:])]
        # per-image "batches" = unbiased gold standard
        singles = [(imgs[i:i + 1], ys[i:i + 1]) for i in range(7)]

        info_r, _ = evaluate(model, params, {}, ragged, epoch=1,
                             num_classes=3, enforce_weight_sparsity=False)
        info_s, _ = evaluate(model, params, {}, singles, epoch=1,
                             num_classes=3, enforce_weight_sparsity=False)

        assert np.array_equal(info_r["confusion_matrix"],
                              info_s["confusion_matrix"])
        # top-1 must equal CM-derived accuracy exactly
        assert info_r["top1_accuracy"] == pytest.approx(
            acc_from_cm(info_r["confusion_matrix"]))
        for k in ("top1_accuracy", "top5_accuracy",
                  "local_size_for_true_class", "local_size_for_all_classes",
                  "almost_nonzeros"):
            assert info_r[k] == pytest.approx(info_s[k], abs=1e-5), k
