"""Chunked training: --max_epochs_per_process + scripts/train_chunked.py.

A 2-epoch run with chunk_epochs=1 must take TWO processes: the first
stops after main epoch 1 with checkpoints/CHUNK_CONTINUE and a resumable
net_trained_last (integer epoch metadata, NO best-model viz yet); the
wrapper resumes, epoch 2 completes, the marker disappears, and the final
artifact tree matches a normal run's.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def shapes_root(tmp_path_factory):
    from count_pipnet_tpu.data.generate_shapes import \
        GeometricShapesGenerator
    root = tmp_path_factory.mktemp("chunked")
    GeometricShapesGenerator({
        "output_dir": str(root / "data/geometric_shapes/dataset"),
        "img_size": 64, "train_samples_per_class": 4,
        "test_samples_per_class": 2, "seed": 0,
        "class_definitions": [("circle", 1), ("triangle", 2)],
        "size_mean": 12, "size_std": 2, "min_object_size": 8,
        "max_object_size": 16,
    }).generate_dataset()
    return root


def test_chunked_run_completes_in_two_processes(shapes_root):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, ".jax_cache"),
               PYTHONPATH=REPO,
               # don't inherit conftest's 8 virtual devices
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    log_dir = str(shapes_root / "runs/chunked")
    args = [
        "--dataset", "geometric_shapes", "--model", "count_pipnet",
        "--image_size", "64", "--net", "convnext_tiny_26",
        "--use_mid_layers", "--num_stages", "1", "--num_features", "8",
        "--max_count", "3", "--use_ste", "True",
        "--intermediate_layer", "onehot", "--batch_size", "4",
        "--batch_size_pretrain", "4", "--epochs", "2",
        "--epochs_pretrain", "1", "--epochs_finetune", "0",
        "--freeze_epochs", "0", "--lr", "0.01", "--lr_block", "0.001",
        "--lr_net", "0.001", "--num_workers", "0", "--seed", "1",
        "--dtype", "float32", "--tanh_loss_coeff", "0.1",
        "--disable_pretrained", "--log_dir", log_dir,
    ]
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/train_chunked.py"),
         "--chunk_epochs", "1", "--max_chunks", "4", "--", *args],
        env=env, cwd=str(shapes_root), capture_output=True, text=True,
        timeout=1200)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
    # two training chunks were launched, the second with resume
    assert "chunk 1:" in out.stdout and "--resume_training" in out.stdout
    assert "run complete" in out.stdout
    marker = os.path.join(log_dir, "checkpoints", "CHUNK_CONTINUE")
    assert not os.path.exists(marker)
    # both epochs logged exactly once
    csv = os.path.join(log_dir, "log_epoch_overview.csv")
    rows = [line.strip().split(",") for line in open(csv)][1:]
    # pretrain rows log "n.a." for test top-1 (reference main.py:292-295)
    pre_rows = [r[0] for r in rows if r[1] == "n.a."]
    main_rows = [r[0] for r in rows if r[1] != "n.a."]
    assert pre_rows == ["1"], rows
    assert sorted(main_rows) == ["1", "2"], rows
    # the finishing chunk did the best-model reload + viz
    assert any(d.startswith("visualised_prototypes_topk_best_model")
               for d in os.listdir(log_dir)), os.listdir(log_dir)
    for name in ("net_pretrained", "net_trained", "net_trained_last",
                 "net_best"):
        assert os.path.exists(os.path.join(log_dir, "checkpoints", name))


def test_watchdog_kills_stalled_child(tmp_path):
    """_run_watched must kill a child that produces no tee output within
    stall_timeout (the wedged-TPU-claim signature) and report the stall;
    a healthy short child exits normally with stalled=False."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from train_chunked import _run_watched

    tee = tmp_path / "out.txt"
    tee.write_text("boot\n")

    rc, stalled = _run_watched(
        [sys.executable, "-c", "import time; time.sleep(600)"],
        str(tee), stall_timeout=2.0, poll_s=0.5)
    assert stalled and rc != 0

    rc, stalled = _run_watched(
        [sys.executable, "-c", "print('fine')"],
        str(tee), stall_timeout=30.0, poll_s=0.5)
    assert (rc, stalled) == (0, False)
