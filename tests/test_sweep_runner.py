"""Sweep runner: config sequencing, shared-pretrain cache, summary.json,
continue_on_error."""

import json
import os
import sys

import pytest
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import run_multiple_configs as rmc


def write_config(path, **over):
    cfg = dict(
        model="count_pipnet", dataset="geometric_shapes", image_size=64,
        net="convnext_tiny_26", use_mid_layers=True, num_stages=1,
        num_features=8, seed=1, epochs=1, epochs_pretrain=1,
        activation="gumbel_softmax",
    )
    cfg.update(over)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)


class Cmd:
    def __init__(self, config_list, log_root, continue_on_error=False,
                 in_process=True):
        # tests run in-process so run_pipnet can be monkeypatched; real
        # sweeps default to subprocess isolation (host-leak containment)
        self.config_list = config_list
        self.log_root = log_root
        self.continue_on_error = continue_on_error
        self.in_process = in_process


def test_sweep_shares_backbone_and_writes_summary(tmp_path, monkeypatch):
    cfg_a = tmp_path / "a.yaml"
    cfg_b = tmp_path / "b.yaml"      # same pretrain key as a
    cfg_c = tmp_path / "c.yaml"      # different num_features
    write_config(cfg_a)
    write_config(cfg_b, intermediate_layer="linear")
    write_config(cfg_c, num_features=4)
    clist = tmp_path / "list.json"
    clist.write_text(json.dumps([str(cfg_a), str(cfg_b), str(cfg_c)]))

    calls = []

    def fake_run(args):
        calls.append(args)
        # a real run writes net_pretrained; the runner only caches dirs
        # that actually contain one
        ckpt_dir = os.path.join(args.log_dir, "checkpoints")
        os.makedirs(ckpt_dir, exist_ok=True)
        with open(os.path.join(ckpt_dir, "net_pretrained"), "wb") as f:
            f.write(b"x")

    import count_pipnet_tpu.train.trainer as trainer_mod
    monkeypatch.setattr(trainer_mod, "run_pipnet", fake_run)

    summary = rmc.run_all_configs(Cmd(str(clist), str(tmp_path / "runs")))
    assert [r["status"] for r in summary["runs"]] == ["success"] * 3
    # run b shares run a's pretrained dir; run c (different key) does not
    assert calls[1].pretrained_checkpoints_dir == calls[0].log_dir
    assert calls[2].pretrained_checkpoints_dir != calls[0].log_dir
    assert (tmp_path / "runs/summary.json").exists()


def test_sweep_stops_or_continues_on_error(tmp_path, monkeypatch):
    cfg_a = tmp_path / "a.yaml"
    cfg_b = tmp_path / "b.yaml"
    write_config(cfg_a)
    write_config(cfg_b)
    clist = tmp_path / "list.json"
    clist.write_text(json.dumps([str(cfg_a), str(cfg_b)]))

    def fail_run(args):
        raise RuntimeError("boom")

    import count_pipnet_tpu.train.trainer as trainer_mod
    monkeypatch.setattr(trainer_mod, "run_pipnet", fail_run)

    summary = rmc.run_all_configs(Cmd(str(clist), str(tmp_path / "r1")))
    assert len(summary["runs"]) == 1  # stopped at first failure

    summary = rmc.run_all_configs(
        Cmd(str(clist), str(tmp_path / "r2"), continue_on_error=True))
    assert [r["status"] for r in summary["runs"]] == ["failed", "failed"]


def test_compatibility_check():
    import argparse
    a = argparse.Namespace(seed=1, num_stages=2, num_features=8,
                           net="convnext_tiny_26", dataset="d",
                           use_mid_layers=True,
                           activation="gumbel_softmax", image_size=64)
    import copy
    b = copy.deepcopy(a)
    assert rmc.verify_compatible_pretraining_params(a, b)
    b.activation = "softmax"
    assert not rmc.verify_compatible_pretraining_params(a, b)
