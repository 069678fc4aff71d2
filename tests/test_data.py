"""Data pipeline tests: generators, ImageFolder, two-view loader,
determinism, weighted sampling."""

import os
import random
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from count_pipnet_tpu.data import augment as A
from count_pipnet_tpu.data.datasets import (
    ImageFolder, TwoAugDataset, TransformedDataset, Subset, stratified_split,
)
from count_pipnet_tpu.data.loader import (
    DataLoader, make_weighted_sample_weights,
)
from count_pipnet_tpu.data.generate_shapes import GeometricShapesGenerator


@pytest.fixture(scope="module")
def shapes_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("shapes")
    gen = GeometricShapesGenerator({
        "output_dir": str(root), "img_size": 64,
        "train_samples_per_class": 4, "test_samples_per_class": 2,
        "seed": 0,
        "class_definitions": [("circle", 1), ("triangle", 2),
                              ("hexagon", 3)],
        "size_mean": 12, "size_std": 2, "min_object_size": 8,
        "max_object_size": 16,
    })
    gen.generate_dataset()
    return root


class TestGenerator:
    def test_imagefolder_layout(self, shapes_dir):
        train = ImageFolder(shapes_dir / "train")
        assert train.classes == ["class_1", "class_2", "class_3"]
        assert len(train) == 12
        test = ImageFolder(shapes_dir / "test")
        assert len(test) == 6

    def test_images_valid(self, shapes_dir):
        ds = ImageFolder(shapes_dir / "train")
        img = ds.load_image(0)
        assert img.size == (64, 64)
        assert img.mode == "RGB"
        arr = np.asarray(img)
        # white-ish background with some colored shape pixels
        assert arr.mean() > 150
        assert arr.std() > 5


class TestTransforms:
    def test_no_augment_pipeline(self, shapes_dir):
        t = A.Compose([A.Resize(32), A.ToArray(), A.Normalize()])
        ds = TransformedDataset(ImageFolder(shapes_dir / "train"), t)
        arr, y = ds[(0, random.Random(0))]
        assert arr.shape == (32, 32, 3)
        assert arr.dtype == np.float32
        assert y == 0

    def test_two_views_differ_but_share_geometry(self, shapes_dir):
        t1 = A.Compose([A.Resize(48), A.RandomRotation(10, fill=255),
                        A.RandomResizedCrop(40, scale=(0.95, 1.0))])
        t2 = A.Compose([A.ColorJitter(0.5, 0.5), A.RandomCrop(32),
                        A.ToArray(), A.Normalize()])
        ds = TwoAugDataset(ImageFolder(shapes_dir / "train"), t1, t2)
        v1, v2, y = ds[(0, random.Random(3))]
        assert v1.shape == v2.shape == (32, 32, 3)
        assert not np.allclose(v1, v2)  # independent photometric draws

    def test_trivial_augment_spaces(self):
        img = Image.new("RGB", (32, 32), (128, 64, 32))
        rng = random.Random(0)
        for cls in (A.TrivialAugmentWide, A.TrivialAugmentWideNoColor,
                    A.TrivialAugmentWideNoShape,
                    A.TrivialAugmentWideNoShapeWithColor):
            aug = cls()
            for _ in range(25):  # exercise every op in the space
                out = aug(img, rng)
                assert out.size == (32, 32)

    def test_nocolor_space_is_geometry_only(self):
        ops = set(A.TrivialAugmentWideNoColor().ops)
        assert ops == {"Identity", "ShearX", "ShearY", "TranslateX",
                       "TranslateY", "Rotate"}

    def test_noshape_space_has_tiny_color(self):
        aug = A.TrivialAugmentWideNoShape()
        mags, signed = aug.space["Color"]
        assert signed and mags.max() <= 0.02
        assert "Solarize" not in aug.space
        assert "Rotate" not in aug.space


class TestLoader:
    def test_two_view_batches(self, shapes_dir):
        t1 = A.Compose([A.Resize(40)])
        t2 = A.Compose([A.RandomCrop(32), A.ToArray(), A.Normalize()])
        ds = TwoAugDataset(ImageFolder(shapes_dir / "train"), t1, t2)
        loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                            num_workers=2, seed=5)
        batches = list(loader)
        assert len(batches) == 3
        xs1, xs2, ys = batches[0]
        assert xs1.shape == (4, 32, 32, 3)
        assert xs2.shape == (4, 32, 32, 3)
        assert ys.shape == (4,)

    def test_epoch_determinism_and_reshuffle(self, shapes_dir):
        t = A.Compose([A.Resize(16), A.ToArray()])
        ds = TransformedDataset(ImageFolder(shapes_dir / "train"), t)
        loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                            num_workers=2, seed=5)
        loader.set_epoch(1)
        ys_a = np.concatenate([b[1] for b in loader])
        ys_b = np.concatenate([b[1] for b in loader])
        np.testing.assert_array_equal(ys_a, ys_b)  # same epoch = same order
        loader.set_epoch(2)
        ys_c = np.concatenate([b[1] for b in loader])
        assert not np.array_equal(ys_a, ys_c)  # different epoch reshuffles

    def test_weighted_sampler_balances(self):
        targets = [0] * 90 + [1] * 10
        w = make_weighted_sample_weights(targets)
        assert w[0] == pytest.approx(1 / 90)
        assert w[-1] == pytest.approx(1 / 10)

    def test_drop_last_false_keeps_remainder(self, shapes_dir):
        t = A.Compose([A.Resize(16), A.ToArray()])
        ds = TransformedDataset(ImageFolder(shapes_dir / "train"), t)
        loader = DataLoader(ds, batch_size=5, shuffle=False, drop_last=False,
                            num_workers=1, seed=0)
        sizes = [b[1].shape[0] for b in loader]
        assert sizes == [5, 5, 2]


class TestSplit:
    def test_stratified(self):
        targets = [0] * 10 + [1] * 10
        tr, te = stratified_split(targets, 0.2, seed=0)
        assert len(te) == 4
        te_targets = [targets[i] for i in te]
        assert te_targets.count(0) == 2 and te_targets.count(1) == 2


class TestHostLocalLoader:
    """Multi-host mode: each process decodes only its slice of every
    global batch; slices across processes reassemble the exact
    single-process global batch (ADVICE r2: per-host decode cost must
    scale 1/process_count without risking cross-host misfeeds)."""

    def test_slices_reassemble_global_batch(self, shapes_dir):
        t = A.Compose([A.Resize(16), A.ToArray()])
        ds = TransformedDataset(ImageFolder(shapes_dir / "train"), t)
        mk = lambda **kw: DataLoader(ds, batch_size=4, shuffle=True,
                                     drop_last=True, num_workers=1,
                                     seed=5, **kw)
        globl = mk()
        p0 = mk(process_index=0, process_count=2)
        p1 = mk(process_index=1, process_count=2)
        for ldr in (globl, p0, p1):
            ldr.set_epoch(3)
        assert len(globl) == len(p0) == len(p1)
        for (gx, gy), (x0, y0), (x1, y1) in zip(globl, p0, p1):
            assert x0.shape[0] == x1.shape[0] == 2
            np.testing.assert_array_equal(gx, np.concatenate([x0, x1]))
            np.testing.assert_array_equal(gy, np.concatenate([y0, y1]))

    def test_indivisible_batch_size_rejected(self, shapes_dir):
        t = A.Compose([A.Resize(16), A.ToArray()])
        ds = TransformedDataset(ImageFolder(shapes_dir / "train"), t)
        with pytest.raises(ValueError, match="not divisible"):
            DataLoader(ds, batch_size=5, process_index=0, process_count=2)

    def test_ragged_chunk_rejected(self):
        # drop_last=False can yield a ragged tail that cannot shard
        class Stub:
            def __len__(self):
                return 5

            def __getitem__(self, key):
                idx, _rng = key
                return np.zeros((2, 2), np.float32), idx

        ldr = DataLoader(Stub(), batch_size=4, shuffle=False,
                         drop_last=False, num_workers=1,
                         process_index=0, process_count=2)
        with pytest.raises(ValueError, match="ragged"):
            list(ldr)


class TestDecodedCache:
    def test_cache_returns_identical_pixels_without_reopening(
            self, tmp_path, monkeypatch):
        from PIL import Image as PILImage
        import count_pipnet_tpu.data.datasets as D

        root = tmp_path / "ds"
        (root / "class_a").mkdir(parents=True)
        arr = (np.arange(8 * 8 * 3) % 255).astype(np.uint8) \
            .reshape(8, 8, 3)
        PILImage.fromarray(arr).save(root / "class_a" / "x.png")

        folder = D.ImageFolder(root, cache_decoded=True)
        first = np.asarray(folder.load_image(0))

        opens = []
        real_open = PILImage.open
        monkeypatch.setattr(
            D, "Image",
            type("M", (), {"open": staticmethod(
                lambda *a, **k: opens.append(a) or real_open(*a, **k)),
                "fromarray": staticmethod(PILImage.fromarray)}))
        second = np.asarray(folder.load_image(0))
        assert not opens  # served from RAM
        np.testing.assert_array_equal(second, first)
        np.testing.assert_array_equal(first, arr)

        # cache off: load_image reopens the file every time
        plain = D.ImageFolder(root)
        np.testing.assert_array_equal(
            np.asarray(plain.load_image(0)), arr)
        assert plain._cache is None


class TestValidateDatasetPaths:
    """validate_dataset_paths: pure-path fail-fast that the trainer runs
    BEFORE its first jax device touch (a client crashing while holding
    the single TPU claim wedges the chip for the next run)."""

    def _args(self, dataset):
        import argparse
        return argparse.Namespace(dataset=dataset)

    def test_unknown_dataset(self, tmp_path):
        from count_pipnet_tpu.data.registry import validate_dataset_paths
        with pytest.raises(ValueError, match="not found"):
            validate_dataset_paths(self._args("nope"), str(tmp_path))

    def test_missing_dirs_listed(self, tmp_path):
        # Non-synthetic dataset: cannot be regenerated from a seed, so
        # missing dirs still raise with the preprocess hint.
        from count_pipnet_tpu.data.registry import validate_dataset_paths
        with pytest.raises(FileNotFoundError, match="CUB-200-2011"):
            validate_dataset_paths(
                self._args("CUB-200-2011"), str(tmp_path))

    def test_synthetic_autoregen(self, tmp_path, monkeypatch):
        """A missing SYNTHETIC dataset is regenerated in place instead of
        raising (data/ensure.py): the generator is invoked with the
        basepath-rebased --output_dir and validation then passes."""
        from count_pipnet_tpu.data import generate_shapes
        from count_pipnet_tpu.data.registry import validate_dataset_paths
        calls = []

        def fake_main(argv):
            calls.append(list(argv))
            out = Path(argv[argv.index("--output_dir") + 1])
            (out / "train").mkdir(parents=True, exist_ok=True)
            (out / "test").mkdir(parents=True, exist_ok=True)

        monkeypatch.setattr(generate_shapes, "main", fake_main)
        validate_dataset_paths(self._args("geometric_shapes"),
                               str(tmp_path))
        assert len(calls) == 1
        out_dir = calls[0][calls[0].index("--output_dir") + 1]
        assert out_dir == str(
            tmp_path / "data/geometric_shapes/dataset")

    def test_synthetic_autoregen_incomplete_still_raises(
            self, tmp_path, monkeypatch):
        """If regeneration does not actually produce the recipe's dirs,
        the original FileNotFoundError still fires (no silent pass)."""
        from count_pipnet_tpu.data import generate_shapes
        from count_pipnet_tpu.data.registry import validate_dataset_paths
        monkeypatch.setattr(generate_shapes, "main", lambda argv: None)
        with pytest.raises(FileNotFoundError, match="geometric_shapes"):
            validate_dataset_paths(
                self._args("geometric_shapes"), str(tmp_path))

    def test_present_dirs_pass(self, tmp_path):
        from count_pipnet_tpu.data.registry import validate_dataset_paths
        for d in ("data/geometric_shapes/dataset/train",
                  "data/geometric_shapes/dataset/test"):
            (tmp_path / d).mkdir(parents=True)
        validate_dataset_paths(self._args("geometric_shapes"),
                               str(tmp_path))
