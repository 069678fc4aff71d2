"""Parameter grouping and schedule tests.

Grouping invariants mirror the reference's parameter-grouping tests
(tests/test-parameter-grouping-convnext.py): final stage -> train,
stage-1 -> freeze, earlier -> backbone; plus classifier/intermediate/
multiplier labeling (util/args.py:250-331).
Schedule values are checked against torch's closed forms.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from count_pipnet_tpu.train.optim import (
    label_params, adamw_init, adamw_update, cosine_lr, warm_restart_lr,
)


def make_fake_params(stages=(0, 1, 2, 3), with_intermediate=True):
    backbone = {}
    for s in stages:
        if s == 0:
            backbone["features_0"] = {"conv": {"kernel": jnp.ones((2, 2))}}
        elif s % 2 == 1:
            backbone[f"features_{s}_block_0"] = {
                "dwconv": {"kernel": jnp.ones((2, 2))}}
        else:
            backbone[f"features_{s}"] = {"conv": {"kernel": jnp.ones((2,))}}
    params = {
        "backbone": backbone,
        "add_on": {"conv1x1": {"kernel": jnp.ones((1, 1)),
                               "bias": jnp.zeros((1,))}},
        "classification": {"weight": jnp.ones((3, 6)),
                           "multiplier": jnp.ones((1,))},
    }
    if with_intermediate:
        params["intermediate"] = {"ramp": jnp.ones((3,))}
    return params


class TestLabeling:
    def test_mid_layer_grouping(self):
        params = make_fake_params()
        labels = label_params(params, "convnext_tiny_26",
                              use_mid_layers=True, num_stages=3)
        b = labels["backbone"]
        assert b["features_3_block_0"]["dwconv"]["kernel"] == "to_train"
        assert b["features_2"]["conv"]["kernel"] == "to_freeze"
        assert b["features_1_block_0"]["dwconv"]["kernel"] == "backbone"
        assert b["features_0"]["conv"]["kernel"] == "backbone"
        assert labels["add_on"]["conv1x1"]["kernel"] == "add_on"
        assert labels["classification"]["weight"] == "cls_weight"
        assert labels["classification"]["multiplier"] == "frozen"
        assert labels["intermediate"]["ramp"] == "intermediate"

    def test_full_convnext_grouping(self):
        params = make_fake_params(stages=(0, 1, 2, 3, 4, 5, 6, 7))
        params["backbone"]["features_7_block_2"] = {
            "dwconv": {"kernel": jnp.ones((2, 2))}}
        labels = label_params(params, "convnext_tiny_26",
                              use_mid_layers=False, num_stages=7)
        b = labels["backbone"]
        assert b["features_7_block_2"]["dwconv"]["kernel"] == "to_train"
        assert b["features_7_block_0"]["dwconv"]["kernel"] == "to_freeze"
        assert b["features_6"]["conv"]["kernel"] == "to_freeze"
        assert b["features_5_block_0"]["dwconv"]["kernel"] == "backbone"

    def test_train_intermediate_false(self):
        params = make_fake_params()
        labels = label_params(params, "convnext_tiny_26",
                              train_intermediate=False)
        assert labels["intermediate"]["ramp"] == "frozen"

    def test_resnet50_grouping(self):
        params = {
            "backbone": {
                "conv1": {"kernel": jnp.ones((1,))},
                "layer2_block_0": {"conv1": {"kernel": jnp.ones((1,))}},
                "layer3_block_0": {"conv1": {"kernel": jnp.ones((1,))}},
                "layer4_block_2": {"conv1": {"kernel": jnp.ones((1,))}},
            },
            "add_on": {},
            "classification": {"weight": jnp.ones((2, 2)),
                               "multiplier": jnp.ones((1,))},
        }
        labels = label_params(params, "resnet50")
        b = labels["backbone"]
        assert b["conv1"]["kernel"] == "frozen"
        assert b["layer2_block_0"]["conv1"]["kernel"] == "backbone"
        assert b["layer3_block_0"]["conv1"]["kernel"] == "to_freeze"
        assert b["layer4_block_2"]["conv1"]["kernel"] == "to_train"


class TestSchedules:
    def test_cosine_endpoints(self):
        assert cosine_lr(1.0, 0, 100, 0.0) == pytest.approx(1.0)
        assert cosine_lr(1.0, 100, 100, 0.0) == pytest.approx(0.0, abs=1e-9)
        assert cosine_lr(1.0, 50, 100, 0.0) == pytest.approx(0.5)
        # eta_min floor
        assert cosine_lr(1.0, 100, 100, 0.01) == pytest.approx(0.01)

    def test_warm_restart_periodicity(self):
        base, t0, emin = 0.05, 5, 0.001
        assert warm_restart_lr(base, 0.0, t0, emin) == pytest.approx(base)
        assert warm_restart_lr(base, 5.0, t0, emin) == pytest.approx(base)
        v = warm_restart_lr(base, 2.5, t0, emin)
        assert v == pytest.approx(emin + (base - emin) / 2)

    def test_torch_parity_cosine(self):
        torch = pytest.importorskip("torch")
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.AdamW([p], lr=0.02)
        sch = torch.optim.lr_scheduler.CosineAnnealingLR(
            opt, T_max=37, eta_min=0.0005)
        for t in range(40):
            got = cosine_lr(0.02, t, 37, 0.0005)
            ref = sch.get_last_lr()[0]
            if t <= 37:
                assert got == pytest.approx(ref, rel=1e-5), t
            opt.step()
            sch.step()

    def test_torch_parity_warm_restarts(self):
        torch = pytest.importorskip("torch")
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.AdamW([p], lr=0.05)
        sch = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
            opt, T_0=5, eta_min=0.001, T_mult=1)
        for frac in np.linspace(0, 12, 25):
            sch.step(frac)
            got = warm_restart_lr(0.05, float(frac), 5, 0.001)
            assert got == pytest.approx(sch.get_last_lr()[0], rel=1e-5)


class TestAdamW:
    def test_matches_torch_adamw(self):
        torch = pytest.importorskip("torch")
        w0 = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
        g0 = np.random.default_rng(1).normal(size=(4, 3)).astype(np.float32)

        tp = torch.nn.Parameter(torch.tensor(w0))
        opt = torch.optim.AdamW([tp], lr=0.01, weight_decay=0.1)
        for _ in range(3):
            opt.zero_grad()
            tp.grad = torch.tensor(g0)
            opt.step()

        params = {"x": jnp.asarray(w0)}
        labels = {"x": "cls_weight"}
        state = adamw_init(params)
        lr = {k: jnp.float32(0.01) for k in
              ("backbone", "to_freeze", "to_train", "add_on", "cls_weight",
               "cls_bias", "intermediate")}
        mask = {k: jnp.float32(1.0) for k in lr}
        wd = {"cls_weight": 0.1}
        for _ in range(3):
            params, state = adamw_update(params, {"x": jnp.asarray(g0)},
                                         state, labels, lr, mask, wd)
        np.testing.assert_allclose(params["x"], tp.detach().numpy(),
                                   rtol=1e-4, atol=1e-5)

    def test_masked_leaf_is_inert(self):
        params = {"a": jnp.ones((2,)), "b": jnp.ones((2,))}
        labels = {"a": "cls_weight", "b": "backbone"}
        state = adamw_init(params)
        lr = {k: jnp.float32(0.1) for k in
              ("backbone", "to_freeze", "to_train", "add_on", "cls_weight",
               "cls_bias", "intermediate")}
        mask = dict({k: jnp.float32(1.0) for k in lr}, backbone=jnp.float32(0.0))
        grads = {"a": jnp.ones((2,)), "b": jnp.ones((2,))}
        new_params, new_state = adamw_update(params, grads, state, labels,
                                             lr, mask, {})
        np.testing.assert_allclose(new_params["b"], params["b"])
        np.testing.assert_allclose(new_state["mu"]["b"], 0.0)
        assert int(new_state["step"]["b"]) == 0
        assert int(new_state["step"]["a"]) == 1
        assert not np.allclose(new_params["a"], params["a"])

    def test_frozen_label_never_updates(self):
        params = {"m": jnp.ones((1,))}
        labels = {"m": "frozen"}
        state = adamw_init(params)
        lr = {k: jnp.float32(0.1) for k in
              ("backbone", "to_freeze", "to_train", "add_on", "cls_weight",
               "cls_bias", "intermediate")}
        mask = {k: jnp.float32(1.0) for k in lr}
        new_params, _ = adamw_update(params, {"m": jnp.ones((1,))}, state,
                                     labels, lr, mask, {})
        np.testing.assert_allclose(new_params["m"], params["m"])
