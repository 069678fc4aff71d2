"""Checkpoint manager: roles, hash discovery, resume, selective loading."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from count_pipnet_tpu.utils.checkpoint import (
    CheckpointManager, config_hash, load_backbone_only,
    find_shared_backbone,
)
from count_pipnet_tpu.utils.log import Log


class Args:
    def __init__(self, log_dir):
        self.log_dir = log_dir
        self.max_count = 3
        self.use_mid_layers = True
        self.num_stages = 2
        self.num_features = 8
        self.activation = "gumbel_softmax"
        self.net = "convnext_tiny_26"
        self.dataset = "geometric_shapes"
        self.pretrained_checkpoints_dir = ""
        self.state_dict_dir_net = ""


def fake_params(scale=1.0):
    return {
        "backbone": {"features_0": {"conv": {
            "kernel": np.full((2, 2, 3, 4), scale, np.float32)}}},
        "add_on": {"conv1x1": {"kernel": np.ones((1, 1, 4, 8), np.float32),
                               "bias": np.zeros((8,), np.float32)}},
        "classification": {"weight": np.ones((3, 24), np.float32) * scale,
                           "multiplier": np.ones((1,), np.float32)},
    }


class TestRolesAndResume:
    def test_three_roles(self, tmp_path):
        args = Args(str(tmp_path / "run"))
        Log(args.log_dir)
        cm = CheckpointManager(args)
        p = fake_params()
        cm.save_pretrained_checkpoint(p)
        cm.save_trained_checkpoint(p, {}, {"mu": {}}, epoch=3)
        assert cm.save_best_checkpoint(p, {}, {}, 3, 0.8)
        assert not cm.save_best_checkpoint(p, {}, {}, 4, 0.7)  # worse
        assert cm.save_best_checkpoint(p, {}, {}, 5, 0.9)

        d = tmp_path / "run/checkpoints"
        for name in ("net_pretrained", f"net_pretrained_{cm.hash}",
                     "net_trained", "net_trained_last", "net_best"):
            assert (d / name).exists(), name

        state, meta = cm.load_trained_checkpoint()
        assert meta["epoch"] == 3
        np.testing.assert_allclose(
            state["params"]["classification"]["weight"],
            p["classification"]["weight"])

        state, meta = cm.load_best_checkpoint()
        assert meta["accuracy"] == pytest.approx(0.9)
        assert meta["epoch"] == 5

    def test_hash_depends_on_pretraining_params(self, tmp_path):
        a1 = Args(str(tmp_path / "a"))
        a2 = Args(str(tmp_path / "b"))
        assert config_hash(a1) == config_hash(a2)
        a2.num_stages = 3
        assert config_hash(a1) != config_hash(a2)

    def test_hash_discovery_across_dirs(self, tmp_path):
        src_args = Args(str(tmp_path / "src"))
        Log(src_args.log_dir)
        cm_src = CheckpointManager(src_args)
        cm_src.save_pretrained_checkpoint(fake_params(2.0))

        dst_args = Args(str(tmp_path / "dst"))
        dst_args.pretrained_checkpoints_dir = src_args.log_dir
        Log(dst_args.log_dir)
        cm_dst = CheckpointManager(dst_args)
        res = cm_dst.load_pretrained_checkpoint()
        assert res is not None
        state, _ = res
        np.testing.assert_allclose(
            state["params"]["classification"]["weight"][0, 0], 2.0)

    def test_mismatched_hash_not_found(self, tmp_path):
        src_args = Args(str(tmp_path / "src"))
        Log(src_args.log_dir)
        CheckpointManager(src_args).save_pretrained_checkpoint(fake_params())

        dst_args = Args(str(tmp_path / "dst"))
        dst_args.num_stages = 5  # different pretraining config
        dst_args.pretrained_checkpoints_dir = src_args.log_dir
        Log(dst_args.log_dir)
        assert CheckpointManager(dst_args).load_pretrained_checkpoint() \
            is None


class TestSelectiveLoading:
    def test_backbone_only_skips_mismatches(self, tmp_path):
        args = Args(str(tmp_path / "run"))
        Log(args.log_dir)
        cm = CheckpointManager(args)
        cm.save_pretrained_checkpoint(fake_params(3.0))
        path = os.path.join(args.log_dir, "checkpoints", "net_pretrained")

        target = fake_params(1.0)
        # classifier has a different shape in the target (should be kept)
        target["classification"]["weight"] = np.zeros((5, 24), np.float32)
        new_params, info = load_backbone_only(path, target)
        assert info["success"]
        np.testing.assert_allclose(
            new_params["backbone"]["features_0"]["conv"]["kernel"][0, 0, 0,
                                                                   0], 3.0)
        # non-backbone scope untouched
        np.testing.assert_allclose(
            new_params["classification"]["weight"], 0.0)

    def test_find_shared_backbone(self, tmp_path):
        args = Args(str(tmp_path / "run"))
        Log(args.log_dir)
        CheckpointManager(args).save_pretrained_checkpoint(fake_params())
        found = find_shared_backbone(args.log_dir)
        assert found is not None and "net_pretrained" in found


class TestLog:
    def test_schema_checking(self, tmp_path):
        log = Log(str(tmp_path / "run"))
        log.create_log("metrics", "epoch", "a", "b")
        log.log_values("metrics", 1, 0.5, 0.7)
        with pytest.raises(ValueError):
            log.log_values("metrics", 2, 0.5)
        with pytest.raises(KeyError):
            log.log_values("nope", 1, 2, 3)
        content = (tmp_path / "run/metrics.csv").read_text().splitlines()
        assert content[0] == "epoch,a,b"
        assert content[1] == "1,0.5,0.7"

    def test_append_gating_on_resume(self, tmp_path):
        """append=True (resumed run) keeps prior rows; the default
        (fresh run reusing a log_dir) truncates like the reference."""
        log1 = Log(str(tmp_path / "run"))
        log1.create_log("metrics", "epoch", "a")
        log1.log_values("metrics", 1, 0.5)

        resumed = Log(str(tmp_path / "run"))
        resumed.create_log("metrics", "epoch", "a", append=True)
        resumed.log_values("metrics", 2, 0.6)
        content = (tmp_path / "run/metrics.csv").read_text().splitlines()
        assert content == ["epoch,a", "1,0.5", "2,0.6"]

        fresh = Log(str(tmp_path / "run"))
        fresh.create_log("metrics", "epoch", "a")
        fresh.log_values("metrics", 1, 0.9)
        content = (tmp_path / "run/metrics.csv").read_text().splitlines()
        assert content == ["epoch,a", "1,0.9"]

        # header mismatch: append must not keep incompatible history
        stale = Log(str(tmp_path / "run"))
        (tmp_path / "run/other.csv").write_text("epoch,z\n1,2\n")
        stale.create_log("other", "epoch", "a", append=True)
        content = (tmp_path / "run/other.csv").read_text().splitlines()
        assert content == ["epoch,a"]


class TestPartialPretrainedRestore:
    def test_cross_intermediate_graft(self, tmp_path):
        """An onehot-pretrained checkpoint (no 'intermediate' params) must
        load into a linear-intermediate model: shared keys restored, the
        intermediate kept at fresh init (the run_multiple_configs
        cross-variant sharing path; reference selective_loading.py)."""
        args = Args(str(tmp_path / "run"))
        Log(args.log_dir)
        cm = CheckpointManager(args)
        saved = fake_params(scale=7.0)
        cm.save_pretrained_checkpoint(saved)

        target_params = fake_params(scale=1.0)
        target_params["intermediate"] = {
            "embed": np.zeros((8, 4), np.float32)}
        target = {"params": target_params, "batch_stats": {},
                  "opt_state": {}}
        res = cm.load_pretrained_checkpoint(target)
        assert res is not None
        state, _ = res
        # shared leaves restored from the checkpoint
        np.testing.assert_allclose(
            state["params"]["classification"]["weight"],
            saved["classification"]["weight"])
        # intermediate kept at the model's fresh init
        np.testing.assert_allclose(
            state["params"]["intermediate"]["embed"],
            target_params["intermediate"]["embed"])

    def test_shape_mismatch_leaf_kept(self, tmp_path):
        args = Args(str(tmp_path / "run2"))
        Log(args.log_dir)
        cm = CheckpointManager(args)
        saved = fake_params(scale=3.0)
        cm.save_pretrained_checkpoint(saved)
        target_params = fake_params(scale=1.0)
        # different classifier width AND an extra subtree -> graft path
        target_params["classification"]["weight"] = \
            np.ones((5, 24), np.float32)
        target_params["intermediate"] = {
            "embed": np.zeros((8, 4), np.float32)}
        target = {"params": target_params, "batch_stats": {},
                  "opt_state": {}}
        state, _ = cm.load_pretrained_checkpoint(target)
        np.testing.assert_allclose(
            state["params"]["classification"]["weight"],
            target_params["classification"]["weight"])
        np.testing.assert_allclose(
            state["params"]["backbone"]["features_0"]["conv"]["kernel"],
            saved["backbone"]["features_0"]["conv"]["kernel"])

    def test_shape_mismatch_identical_structure(self, tmp_path):
        """Same tree STRUCTURE, one leaf with a different shape — the
        onehot->identity sweep case (head (9,48) vs (9,16)): both have
        parameterless intermediates, so flax's from_state_dict 'succeeds'
        and hands back the wrong-shaped leaf. The loader must graft
        leaf-wise and keep the fresh head."""
        args = Args(str(tmp_path / "run3"))
        Log(args.log_dir)
        cm = CheckpointManager(args)
        saved = fake_params(scale=3.0)
        cm.save_pretrained_checkpoint(saved)
        target_params = fake_params(scale=1.0)
        # same keys everywhere; only the head width differs
        target_params["classification"]["weight"] = \
            np.ones((5, 24), np.float32)
        target = {"params": target_params, "batch_stats": {},
                  "opt_state": {}}
        state, _ = cm.load_pretrained_checkpoint(target)
        np.testing.assert_allclose(
            state["params"]["classification"]["weight"],
            target_params["classification"]["weight"])
        np.testing.assert_allclose(
            state["params"]["backbone"]["features_0"]["conv"]["kernel"],
            saved["backbone"]["features_0"]["conv"]["kernel"])


class TestDonorDirShadowing:
    """A shared pretrained_checkpoints_dir pointing at a FULL donor run
    (as the sweep runner does) must not shadow this run's own
    net_best / net_trained_last: those roles are per-run artifacts.
    Regression for the round-3 sweep bug where every variant's final
    best-model reload loaded the onehot donor's checkpoint."""

    def test_best_prefers_own_run(self, tmp_path):
        donor_args = Args(str(tmp_path / "donor"))
        Log(donor_args.log_dir)
        cm_donor = CheckpointManager(donor_args)
        cm_donor.save_best_checkpoint(fake_params(scale=7.0), {}, {}, 97,
                                      0.97)

        run_args = Args(str(tmp_path / "run"))
        run_args.pretrained_checkpoints_dir = donor_args.log_dir
        Log(run_args.log_dir)
        cm = CheckpointManager(run_args)
        cm.save_best_checkpoint(fake_params(scale=2.0), {}, {}, 12, 0.5)

        state, meta = cm.load_best_checkpoint()
        assert meta["epoch"] == 12
        w = np.asarray(state["params"]["classification"]["weight"])
        assert np.all(w == 2.0)

        # the donor best remains reachable only when the run has none
        run2 = Args(str(tmp_path / "run2"))
        run2.pretrained_checkpoints_dir = donor_args.log_dir
        Log(run2.log_dir)
        cm2 = CheckpointManager(run2)
        state2, meta2 = cm2.load_best_checkpoint()
        assert meta2["epoch"] == 97


class TestBestAcrossProcesses:
    def test_resumed_manager_does_not_clobber_best(self, tmp_path):
        """A RESUMED manager over an existing run dir must seed its best
        accuracy from the net_best sidecar: a resumed process's first
        (worse) epoch must NOT overwrite the true best (regression: the
        flagship resume overwrote a 14.3% net_best with 1.45%)."""
        args = Args(str(tmp_path))
        m1 = CheckpointManager(args)
        p = fake_params()
        assert m1.save_best_checkpoint(p, {}, {}, epoch=7, accuracy=0.143)

        args.resume_training = True
        m2 = CheckpointManager(args)  # the resumed process
        assert m2.best_accuracy == pytest.approx(0.143)
        assert not m2.save_best_checkpoint(p, {}, {}, epoch=38,
                                           accuracy=0.0145)
        best = m2.load_best_checkpoint()
        assert best is not None
        assert best[1]["epoch"] == 7
        # a genuine improvement still saves
        assert m2.save_best_checkpoint(p, {}, {}, epoch=40, accuracy=0.2)
        assert m2.load_best_checkpoint()[1]["epoch"] == 40

    def test_fresh_run_over_stale_dir_saves_its_own_best(self, tmp_path):
        """WITHOUT --resume_training, an existing net_best from a
        previous run in the same log_dir must not pin best_accuracy —
        the new run's (lower) best must be saveable and reloadable, like
        the reference's truncate-on-rerun behavior."""
        args = Args(str(tmp_path))
        m1 = CheckpointManager(args)
        p = fake_params()
        assert m1.save_best_checkpoint(p, {}, {}, epoch=9, accuracy=0.9)

        m2 = CheckpointManager(args)  # fresh run, same log_dir
        assert m2.best_accuracy == -1.0
        assert m2.save_best_checkpoint(fake_params(0.5), {}, {}, epoch=1,
                                       accuracy=0.15)
        assert m2.load_best_checkpoint()[1]["epoch"] == 1

    def test_tau_roundtrip_through_trained_checkpoint(self, tmp_path):
        """The annealed Gumbel temperature is persisted in the rolling
        checkpoint's metadata so a resumed/chunked run continues the
        trajectory (the torch reference loses tau on resume — it is a
        plain attribute, not in state_dict; count_pipnet_utils.py:13-21)."""
        args = Args(str(tmp_path))
        cm = CheckpointManager(args)
        p = fake_params()
        cm.save_trained_checkpoint(p, {}, {}, epoch=12, tau=0.1)
        _, meta = cm.load_trained_checkpoint()
        assert meta["epoch"] == 12
        assert meta["tau"] == pytest.approx(0.1)
        # both rolling roles carry it
        _, meta_last = cm.load_trained_checkpoint(name="net_trained")
        assert meta_last["tau"] == pytest.approx(0.1)
