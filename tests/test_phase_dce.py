"""Phase-DCE'd train step: statically freezing a label set via
stop_gradient must be *observationally identical* to the runtime mask
(which already makes frozen updates inert) — same new params, same
optimizer state, same metrics — while letting XLA drop the frozen
backward (torch requires_grad semantics, reference main.py:238-253,
333-390)."""

import jax
import jax.numpy as jnp
import numpy as np

from count_pipnet_tpu.models import get_count_network
from count_pipnet_tpu.train.optim import label_params, adamw_init
from count_pipnet_tpu.train.steps import make_train_step


class Args:
    net = "convnext_tiny_26"
    num_features = 4
    use_mid_layers = True
    num_stages = 2
    bias = False
    activation = "softmax"  # deterministic
    intermediate_layer = "onehot"
    positive_grad_strategy = None
    backward_clamp_strategy = "Identity"
    disable_pretrained = True


ALL_LABELS = ("backbone", "to_freeze", "to_train", "add_on",
              "cls_weight", "cls_bias", "intermediate")


def _fixture():
    model, _ = get_count_network(2, Args, max_count=3, use_ste=True)
    batch, img = 4, 32
    x0 = jnp.zeros((batch, img, img, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0)
    labels = label_params(variables["params"], Args.net,
                          use_mid_layers=True, num_stages=Args.num_stages)
    rng = np.random.default_rng(0)
    xs1 = rng.normal(size=(batch, img, img, 3)).astype(np.float32)
    xs2 = rng.normal(size=(batch, img, img, 3)).astype(np.float32)
    ys = (np.arange(batch) % 2).astype(np.int32)
    return model, variables["params"], labels, (xs1, xs2, ys)


def _sched(mask_on):
    lr = {k: jnp.float32(1e-2) for k in ALL_LABELS}
    mask = {k: jnp.float32(1.0 if k in mask_on else 0.0)
            for k in ALL_LABELS}
    return {"lr": lr, "mask": mask, "align_w": jnp.float32(1.0),
            "tanh_w": jnp.float32(1.0), "class_w": jnp.float32(1.0),
            "pretrain": jnp.float32(0.0), "finetune": jnp.float32(0.0),
            "tau": jnp.float32(1.0), "project": jnp.float32(1.0)}


def _run(model, params, labels, batch, frozen, sched, steps=2):
    step = make_train_step(model, labels, is_count_pipnet=True,
                           enforce_weight_sparsity=True,
                           tanh_loss_coeff=0.1, donate=False,
                           frozen_labels=frozen)
    p, opt = params, adamw_init(params)
    ms = []
    for i in range(steps):
        p, _, opt, m = step(p, {}, opt, batch, jax.random.PRNGKey(7 + i),
                            sched)
        ms.append(m)
    return p, opt, ms


def _assert_trees_equal(a, b, rtol=2e-4, atol=1e-6):
    # not bit-exact: DCE-ing the frozen wgrads changes XLA's fusion and
    # float reduction order for the surviving gradients
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32),
                                   rtol=rtol, atol=atol)


class TestPhaseDCE:
    def test_freeze_phase_matches_masked_step(self):
        """freeze_epochs phase: backbone frozen, everything else trains."""
        model, params, labels, batch = _fixture()
        trainable = {"to_train", "to_freeze", "add_on", "intermediate",
                     "cls_weight", "cls_bias"}
        sched = _sched(trainable)
        frozen = frozenset(ALL_LABELS) - trainable | {"frozen"}
        p_ref, o_ref, m_ref = _run(model, params, labels, batch,
                                   frozenset(), sched)
        p_dce, o_dce, m_dce = _run(model, params, labels, batch, frozen,
                                   sched)
        for a, b in zip(m_ref, m_dce):
            np.testing.assert_allclose(float(a["loss"]), float(b["loss"]),
                                       rtol=1e-6)
        _assert_trees_equal(p_ref, p_dce)
        _assert_trees_equal(o_ref["mu"], o_dce["mu"])
        _assert_trees_equal(o_ref["nu"], o_dce["nu"])

    def test_finetune_phase_matches_masked_step(self):
        """finetune: only the classifier/intermediate train — the whole
        backbone backward is dead code under DCE."""
        model, params, labels, batch = _fixture()
        trainable = {"cls_weight", "cls_bias", "intermediate"}
        sched = _sched(trainable)
        frozen = frozenset(ALL_LABELS) - trainable | {"frozen"}
        p_ref, _, _ = _run(model, params, labels, batch, frozenset(),
                           sched)
        p_dce, _, _ = _run(model, params, labels, batch, frozen, sched)
        _assert_trees_equal(p_ref, p_dce)

    def test_pretrain_phase_matches_masked_step(self):
        """pretrain: to_train/to_freeze/add_on train; classifier frozen;
        align+tanh loss only."""
        model, params, labels, batch = _fixture()
        trainable = {"to_train", "to_freeze", "add_on"}
        sched = _sched(trainable)
        sched["class_w"] = jnp.float32(0.0)
        sched["pretrain"] = jnp.float32(1.0)
        sched["project"] = jnp.float32(0.0)
        frozen = frozenset(ALL_LABELS) - trainable | {"frozen"}
        p_ref, o_ref, _ = _run(model, params, labels, batch, frozenset(),
                               sched)
        p_dce, o_dce, _ = _run(model, params, labels, batch, frozen,
                               sched)
        _assert_trees_equal(p_ref, p_dce)
        _assert_trees_equal(o_ref["mu"], o_dce["mu"])

    def test_trainer_uses_phase_steps(self):
        """The Trainer must route epochs through the DCE'd step cache and
        produce one entry per distinct frozen set."""
        from count_pipnet_tpu.train.trainer import Trainer

        class TArgs(Args):
            seed = 1
            model = "count_pipnet"
            max_count = 3
            use_ste = True
            dtype = "float32"
            image_size = 32
            weight_decay = 0.0
            mesh_shape = 1
            train_intermediate = True
            enforce_weight_sparsity = True
            tanh_loss_coeff = 0.1
            lr = 0.05
            lr_net = 5e-4
            lr_block = 5e-4

        tr = Trainer(TArgs, num_classes=2)

        class FakeLoader:
            device_augment_cfg = None
            host_local = False

            def set_epoch(self, e):
                pass

            def __len__(self):
                return 1

            def __iter__(self):
                rng = np.random.default_rng(0)
                x1 = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
                x2 = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
                ys = np.array([0, 1, 0, 1], np.int32)
                yield (x1, x2, ys)

        loader = FakeLoader()
        net_sched = {"kind": "cosine", "T": 10, "eta_min": 0.0, "step": 0}
        cls_sched = {"T0": 5, "eta_min": 0.001}
        # pretrain epoch then a frozen-backbone main epoch: two distinct
        # frozen sets -> two cached steps
        tr.train_epoch(loader, 1, 2, pretrain=True, finetune=False,
                       masks=tr.pretrain_masks(), net_sched=net_sched,
                       cls_sched=None)
        masks, finetune = tr.main_masks(1, 0, 5)
        tr.train_epoch(loader, 1, 2, pretrain=False, finetune=finetune,
                       masks=masks, net_sched=net_sched,
                       cls_sched=cls_sched)
        assert len(tr._phase_steps) == 2
