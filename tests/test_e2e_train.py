"""End-to-end smoke test: full two-phase Count-PIPNet training on a tiny
generated shapes dataset (the reference's de-facto e2e fixture,
SURVEY.md §4), exercising loaders, the jitted train step on an 8-device CPU
mesh, eval, CSV logging, and checkpoints."""

import os

import numpy as np
import pytest

from count_pipnet_tpu.config import build_parser
from count_pipnet_tpu.data.generate_shapes import GeometricShapesGenerator


@pytest.fixture(scope="module")
def run_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data_dir = root / "data/geometric_shapes/dataset"
    gen = GeometricShapesGenerator({
        "output_dir": str(data_dir), "img_size": 64,
        "train_samples_per_class": 8, "test_samples_per_class": 4,
        "seed": 0,
        "class_definitions": [("circle", 1), ("triangle", 2),
                              ("hexagon", 3)],
        "size_mean": 12, "size_std": 2, "min_object_size": 8,
        "max_object_size": 16,
    })
    gen.generate_dataset()
    return root


def make_args(root, **overrides):
    args = build_parser().parse_args([])
    defaults = dict(
        dataset="geometric_shapes", model="count_pipnet", image_size=64,
        net="convnext_tiny_26", use_mid_layers=True, num_stages=1,
        num_features=8, max_count=3, use_ste=True,
        activation="gumbel_softmax", intermediate_layer="onehot",
        batch_size=8, batch_size_pretrain=8, epochs=2, epochs_pretrain=1,
        epochs_finetune=1, freeze_epochs=0, lr=0.01, lr_block=0.001,
        lr_net=0.001, num_workers=2, seed=1, dtype="float32",
        log_dir=str(root / "runs/e2e"), enforce_weight_sparsity=True,
        tanh_loss_coeff=0.1, disable_pretrained=True,
    )
    defaults.update(overrides)
    for k, v in defaults.items():
        setattr(args, k, v)
    return args


@pytest.mark.slow
def test_full_training_run(run_env, monkeypatch):
    monkeypatch.chdir(run_env)
    from count_pipnet_tpu.train.trainer import run_pipnet

    args = make_args(run_env)
    trainer = run_pipnet(args)

    # CSV log written with the 15-column schema
    csv = run_env / "runs/e2e/log_epoch_overview.csv"
    assert csv.exists()
    lines = csv.read_text().strip().splitlines()
    header = lines[0].split(",")
    assert header[0] == "epoch"
    assert len(lines) == 1 + args.epochs_pretrain + args.epochs
    # pretrain rows have n.a. accuracy, main rows have numbers
    assert lines[1].split(",")[1] == "n.a."
    float(lines[-1].split(",")[1])

    # checkpoints with all three roles
    ckpt_dir = run_env / "runs/e2e/checkpoints"
    for name in ("net_pretrained", "net_trained", "net_trained_last",
                 "net_best"):
        assert (ckpt_dir / name).exists(), name

    # metadata saved
    assert (run_env / "runs/e2e/metadata/args.txt").exists()
    assert (run_env / "runs/e2e/metadata/args.pickle").exists()

    # params finite
    import jax
    flat = jax.tree_util.tree_leaves(jax.device_get(trainer.params))
    for leaf in flat:
        assert np.all(np.isfinite(leaf))


@pytest.mark.slow
def test_resume_from_checkpoint(run_env, monkeypatch):
    """Epoch extension: resuming a FINISHED run with a larger --epochs
    must continue from the stored final epoch (net_trained_last keeps an
    integer epoch in its metadata precisely for this), append to the
    existing CSV rather than truncate it, and skip pretraining. This is
    the semantics the flagship nosparse 25->60 extension run relies on
    (configs/flagship_200_nosparse_ext.yaml)."""
    monkeypatch.chdir(run_env)
    from count_pipnet_tpu.train.trainer import run_pipnet

    csv = run_env / "runs/e2e/log_epoch_overview.csv"
    before = csv.read_text().strip().splitlines()

    args = make_args(run_env, resume_training=True, epochs=3)
    run_pipnet(args)

    after = csv.read_text().strip().splitlines()
    # prior rows preserved byte-for-byte (append, not truncate)...
    assert after[:len(before)] == before
    # ...plus exactly the one extension epoch, numbered 3 (continuation,
    # not a restart from 1), with a numeric eval accuracy
    assert len(after) == len(before) + 1
    last = after[-1].split(",")
    assert last[0] == "3"
    float(last[1])
    # no pretrain rows were added (epochs_pretrain zeroed on resume)
    assert sum(1 for ln in after if ln.split(",")[1] == "n.a.") == sum(
        1 for ln in before if ln.split(",")[1] == "n.a.")


@pytest.mark.slow
def test_pipnet_training_run(run_env, monkeypatch):
    """The original PIP-Net (max-pool head, softmax add-on, no
    intermediate layer) through the same two-phase loop."""
    monkeypatch.chdir(run_env)
    from count_pipnet_tpu.train.trainer import run_pipnet

    args = make_args(run_env, model="pipnet", activation="softmax",
                     log_dir=str(run_env / "runs/e2e_pipnet"),
                     num_features=8, epochs=2, epochs_pretrain=1,
                     epochs_finetune=1)
    trainer = run_pipnet(args)
    assert not trainer.is_count

    csv = run_env / "runs/e2e_pipnet/log_epoch_overview.csv"
    lines = csv.read_text().strip().splitlines()
    assert len(lines) == 1 + 1 + 2
    # eval wrote a numeric accuracy for the main epochs
    float(lines[-1].split(",")[1])
    assert (run_env / "runs/e2e_pipnet/checkpoints/net_best").exists()


@pytest.mark.slow
def test_device_augment_training_run(run_env, monkeypatch):
    """Two-view photometric augmentation on device: loaders ship t1 crops,
    the trainer produces both views on the accelerator."""
    monkeypatch.chdir(run_env)
    from count_pipnet_tpu.train.trainer import run_pipnet

    args = make_args(run_env, device_augment=True,
                     log_dir=str(run_env / "runs/e2e_devaug"),
                     epochs=1, epochs_pretrain=1, epochs_finetune=0)
    trainer = run_pipnet(args)
    assert args.wshape > 0
    csv = run_env / "runs/e2e_devaug/log_epoch_overview.csv"
    lines = csv.read_text().strip().splitlines()
    assert len(lines) == 3
    float(lines[-1].split(",")[1])  # numeric eval accuracy


@pytest.mark.slow
def test_unfreeze_warmup_ramps_backbone_lr(run_env, monkeypatch):
    """--unfreeze_warmup_epochs must ramp the lower-backbone LR linearly
    from 0 across the post-unfreeze window (per step), leaving the
    schedule untouched once the ramp completes. Captured via the LR
    curve the trainer hands to _plot_lrs (the same values lr_net.png
    plots)."""
    monkeypatch.chdir(run_env)
    import count_pipnet_tpu.train.trainer as T
    from count_pipnet_tpu.train.optim import cosine_lr

    captured = {}
    orig = T._plot_lrs

    def spy(values, path, **kw):
        captured[os.path.basename(path)] = list(values)
        return orig(values, path, **kw)

    monkeypatch.setattr(T, "_plot_lrs", spy)

    args = make_args(run_env, epochs=4, epochs_pretrain=1,
                     epochs_finetune=0, freeze_epochs=1,
                     unfreeze_warmup_epochs=2, lr_net=0.01,
                     log_dir=str(run_env / "runs/e2e_warmup"))
    T.run_pipnet(args)

    lrs = captured["lr_net.png"]
    iters = 3  # 24 train imgs / batch 8
    assert len(lrs) == 4 * iters
    T_total = 4 * iters
    base = [cosine_lr(0.01, s, T_total, 0.01 / 100)
            for s in range(T_total)]
    # epoch 1 (frozen phase, no warmup): pure cosine
    assert lrs[0] == pytest.approx(base[0])
    # epoch 2 begins the ramp at exactly 0, climbing per STEP
    assert lrs[iters] == 0.0
    assert lrs[iters + 1] == pytest.approx(base[iters + 1] * (1 / 3) / 2)
    # epoch 3 mid-ramp: scale (1 + i/3)/2
    assert lrs[2 * iters] == pytest.approx(base[2 * iters] * 0.5)
    # epoch 4: ramp complete, back on the unscaled cosine
    assert lrs[3 * iters] == pytest.approx(base[3 * iters])


@pytest.mark.slow
def test_pipeline_depth_parity(run_env, monkeypatch):
    """--pipeline_depth only defers WHEN step metrics are fetched, never
    what is computed: a run with the synchronous depth-0 loop and one
    with the default depth-2 dispatch window must produce identical
    epoch CSVs (losses, accuracies, eval metrics) for the same seed."""
    monkeypatch.chdir(run_env)
    from count_pipnet_tpu.train.trainer import run_pipnet

    rows = {}
    for depth in (0, 2):
        args = make_args(run_env, pipeline_depth=depth,
                         log_dir=str(run_env / f"runs/e2e_pd{depth}"))
        run_pipnet(args)
        csv = run_env / f"runs/e2e_pd{depth}/log_epoch_overview.csv"
        rows[depth] = csv.read_text().strip().splitlines()

    assert rows[0] == rows[2]
