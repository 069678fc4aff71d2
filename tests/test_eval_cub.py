"""CUB part-purity evaluation on a fully synthetic fixture.

No real CUB data exists in this environment, so the annotation files
(images.txt / part_locs.txt / parts.txt) and patch CSV are synthesized
with known geometry: prototype 0's patches always contain the "beak"
part point, prototype 1's never contain any part. Expected purities are
then exact. Reference contract: util/eval_cub_csv.py:16-176.
"""

import csv
import os

import numpy as np
from PIL import Image

from count_pipnet_tpu.interpret.eval_cub_csv import (
    eval_prototypes_cub_parts_csv, CSV_COLUMNS,
)


class Args:
    image_size = 64
    wshape = 8


def _write(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_part_purity_exact(tmp_path):
    img_dir = tmp_path / "imgs" / "001.Species"
    os.makedirs(img_dir)
    img_paths = []
    for i in range(4):
        p = img_dir / f"bird_{i}.jpg"
        Image.new("RGB", (128, 128), (i * 10, 0, 0)).save(p)
        img_paths.append(str(p))

    _write(tmp_path / "images.txt",
           [f"{i + 1} 001.Species/bird_{i}.jpg" for i in range(4)])
    # one visible part ("beak", id 1; plus left/right wing pair) per image
    # at original-image coords (64, 64) = center
    _write(tmp_path / "parts.txt",
           ["1 beak", "2 left wing", "3 right wing"])
    _write(tmp_path / "part_locs.txt",
           [f"{i + 1} 1 64.0 64.0 1" for i in range(4)]
           + [f"{i + 1} 2 10.0 10.0 1" for i in range(4)])

    # patch CSV in model-input (64px) coords: prototype 0 covers the
    # center (so the beak at 64,64 original = 32,32 model is inside);
    # prototype 1 sits in the far corner (contains the left wing at
    # original 10,10 = model 5,5)
    csvfile = tmp_path / "patches.csv"
    with open(csvfile, "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow(CSV_COLUMNS)
        for i in range(4):
            wr.writerow([0, img_paths[i], 16, 48, 16, 48])
            wr.writerow([1, img_paths[i], 0, 12, 0, 12])

    res = eval_prototypes_cub_parts_csv(
        str(csvfile), str(tmp_path / "part_locs.txt"),
        str(tmp_path / "parts.txt"), str(tmp_path / "images.txt"),
        epoch=1, args=Args, log=None)

    # proto 0: beak inside all 4 patches -> purity 1.0
    # proto 1: left wing (merged into right wing) inside -> purity 1.0 for
    # the wing, beak purity 0
    assert res["part_related"] == 2
    assert res["max_purity_part"]["0"] == "beak"
    assert res["max_purity_part"]["1"] == "right wing"
    assert abs(res["mean_purity"] - 1.0) < 1e-9


def test_patch_center_crop_shrinks_oversized(tmp_path):
    """Oversized patches are center-cropped to patchsize before the
    intersection (reference :78-88): a part point just inside the raw box
    but outside the cropped box must NOT count."""
    img_dir = tmp_path / "i" / "001.S"
    os.makedirs(img_dir)
    p = img_dir / "bird_0.jpg"
    Image.new("RGB", (64, 64)).save(p)
    _write(tmp_path / "images.txt", ["1 001.S/bird_0.jpg"])
    _write(tmp_path / "parts.txt", ["1 beak"])
    # part at model coord y=2,x=2 (image is 64 = model size)
    _write(tmp_path / "part_locs.txt", ["1 1 2.0 2.0 1"])
    csvfile = tmp_path / "c.csv"
    with open(csvfile, "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow(CSV_COLUMNS)
        # raw box [0, 64) contains (2,2); after center-crop to patchsize
        # (32 at wshape 8 / image 64 -> get_patch_size) the box becomes
        # [16, 48) which does not
        wr.writerow([0, str(p), 0, 64, 0, 64])
    res = eval_prototypes_cub_parts_csv(
        str(csvfile), str(tmp_path / "part_locs.txt"),
        str(tmp_path / "parts.txt"), str(tmp_path / "images.txt"),
        epoch=1, args=Args, log=None)
    assert res["part_related"] == 0
    assert res["mean_purity"] == 0.0


def test_evaluate_runs_grouping(tmp_path):
    """notebooks/evaluate_runs.py groups seeds of a config and reports
    the best-epoch metrics (multi-seed evaluation analogue)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "evaluate_runs",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "notebooks", "evaluate_runs.py"))
    ev = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ev)

    header = ("epoch,test_top1_acc,local_size_for_true_class,"
              "local_size_for_all_classes,prototypes_per_class,"
              "almost_nonzeros_pooled,num_nonzero_prototypes,"
              "mean_train_acc,mean_train_loss_during_epoch")
    for name, accs in (("cfgA_seed1_20260101_000000", [0.2, 0.5, 0.4]),
                       ("cfgA_seed2_20260101_000001", [0.1, 0.3, 0.7]),
                       ("cfgB_20260101_000002", [0.9])):
        d = tmp_path / name
        os.makedirs(d)
        rows = [header, "1,n.a.,n.a.,n.a.,n.a.,n.a.,n.a.,0.1,1.0"]
        rows += [f"{i + 2},{a},2.0,3.0,4.0,5.0,6,0.5,0.5"
                 for i, a in enumerate(accs)]
        _write(d / "log_epoch_overview.csv", rows)

    groups = ev.collect([str(tmp_path / n) for n in os.listdir(tmp_path)])
    assert set(groups) == {"cfgA", "cfgB"}
    assert len(groups["cfgA"]) == 2
    table = ev.report(groups, str(tmp_path / "out"))
    assert "cfgA" in table and "0.600" in table  # mean(0.5, 0.7)
