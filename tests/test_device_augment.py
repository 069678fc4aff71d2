"""Device-side two-view augmentation: shape/semantics checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from count_pipnet_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD
from count_pipnet_tpu.data.device_augment import (
    DeviceAugmentConfig, make_device_twoview_augment,
)


class TestDeviceAugment:
    def setup_method(self):
        self.cfg = DeviceAugmentConfig(img_size=16, brightness=0.1,
                                       contrast=0.1, noise_std=0.1)
        self.aug = make_device_twoview_augment(self.cfg)
        rng = np.random.default_rng(0)
        # t1 output: img_size + 8 margin, [0, 1]
        self.batch = jnp.asarray(
            rng.uniform(0, 1, (4, 24, 24, 3)).astype(np.float32))

    def test_two_views_shapes_and_independence(self):
        v1, v2 = self.aug(jax.random.PRNGKey(0), self.batch)
        assert v1.shape == v2.shape == (4, 16, 16, 3)
        assert not np.allclose(np.asarray(v1), np.asarray(v2))

    def test_deterministic_per_key(self):
        a1, a2 = self.aug(jax.random.PRNGKey(3), self.batch)
        b1, b2 = self.aug(jax.random.PRNGKey(3), self.batch)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(b1))
        c1, _ = self.aug(jax.random.PRNGKey(4), self.batch)
        assert not np.allclose(np.asarray(a1), np.asarray(c1))

    def test_normalization_statistics(self):
        # identity photometrics + no noise -> just crop + normalize
        cfg = DeviceAugmentConfig(img_size=16, brightness=0.0,
                                  contrast=0.0, noise_std=0.0)
        aug = make_device_twoview_augment(cfg)
        v1, _ = aug(jax.random.PRNGKey(0), self.batch)
        # invert normalization -> values back in [0, 1]
        inv = np.asarray(v1) * np.asarray(IMAGENET_STD) \
            + np.asarray(IMAGENET_MEAN)
        assert inv.min() >= -1e-5 and inv.max() <= 1 + 1e-5

    def test_crop_content_comes_from_input(self):
        cfg = DeviceAugmentConfig(img_size=16, brightness=0.0,
                                  contrast=0.0, noise_std=0.0)
        aug = make_device_twoview_augment(cfg)
        v1, _ = aug(jax.random.PRNGKey(1), self.batch)
        inv = np.asarray(v1[0]) * np.asarray(IMAGENET_STD) \
            + np.asarray(IMAGENET_MEAN)
        # the crop must appear verbatim somewhere in the source image
        src = np.asarray(self.batch[0])
        found = False
        for oy in range(9):
            for ox in range(9):
                if np.allclose(src[oy:oy + 16, ox:ox + 16], inv,
                               atol=1e-5):
                    found = True
        assert found


class TestUint8Transport:
    def test_uint8_matches_float_exactly(self):
        """uint8 transport + device /255 equals shipping ToArray's
        float32 up to one float-rounding ulp (XLA fuses the division
        into the augment pipeline, so association differs)."""
        from count_pipnet_tpu.data.device_augment import (
            DeviceAugmentConfig, make_device_twoview_augment,
        )
        rng = np.random.default_rng(0)
        raw_u8 = rng.integers(0, 256, size=(2, 40, 40, 3), dtype=np.uint8)
        raw_f32 = raw_u8.astype(np.float32) / 255.0
        cfg = DeviceAugmentConfig(img_size=32, brightness=0.1,
                                  contrast=0.1, noise_std=0.1, noise_p=0.5)
        aug = make_device_twoview_augment(cfg)
        key = jax.random.PRNGKey(3)
        v1u, v2u = aug(key, jnp.asarray(raw_u8))
        v1f, v2f = aug(key, jnp.asarray(raw_f32))
        np.testing.assert_allclose(np.asarray(v1u), np.asarray(v1f),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(v2u), np.asarray(v2f),
                                   atol=1e-5)

    def test_registry_ships_uint8(self, tmp_path):
        """The device-augment recipe's host pipeline emits uint8."""
        from count_pipnet_tpu.data.augment import ToUint8Array
        from PIL import Image
        arr = ToUint8Array()(Image.new("RGB", (8, 8), (3, 200, 77)))
        assert arr.dtype == np.uint8 and arr.shape == (8, 8, 3)


class TestDeviceGeometric:
    """--device_geometric: the shared transform1 (rotation + RRC) as one
    on-device bilinear resample (data/device_augment._shared_geo)."""

    @staticmethod
    def _cfg(**kw):
        base = dict(img_size=24, brightness=0.0, contrast=0.0,
                    noise_std=0.0, geo=True, geo_rot=10.0, geo_out=24,
                    geo_scale=(0.95, 1.0), geo_fill=1.0)
        base.update(kw)
        return DeviceAugmentConfig(**base)

    def test_identity_when_no_rotation_full_scale(self):
        """rot=0 + scale=(1,1) + geo_out == canvas: every RRC candidate
        with aspect != 1 is out of bounds, so the center full-frame
        fallback fires and the resample hits exact integer coordinates —
        the geo stage must be an exact identity."""
        from count_pipnet_tpu.data.device_augment import _shared_geo
        cfg = self._cfg(geo_rot=0.0, geo_scale=(1.0, 1.0), geo_out=32)
        img = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (32, 32, 3)).astype(np.float32))
        out = _shared_geo(jax.random.PRNGKey(5), img, cfg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                   atol=1e-6)

    def test_rotation_fills_corners_white(self):
        from count_pipnet_tpu.data.device_augment import _shared_geo
        cfg = self._cfg(geo_rot=45.0, geo_scale=(1.0, 1.0), geo_out=32)
        img = jnp.zeros((32, 32, 3), jnp.float32)  # black canvas
        for seed in range(4):
            out = np.asarray(_shared_geo(jax.random.PRNGKey(seed), img,
                                         cfg))
            # a corner of the rotated frame samples outside -> fill=1
            corners = out[[0, 0, -1, -1], [0, -1, 0, -1]]
            if corners.max() > 0.99:
                return
        raise AssertionError("no corner ever saw the white fill")

    def test_axis_aligned_structure_preserved(self):
        """rot=0: a horizontal gradient stays a horizontal gradient
        through any crop+resize (rows remain constant)."""
        from count_pipnet_tpu.data.device_augment import _shared_geo
        cfg = self._cfg(geo_rot=0.0, geo_out=24)
        col = np.linspace(0, 1, 32, dtype=np.float32)
        img = jnp.asarray(np.broadcast_to(col[None, :, None],
                                          (32, 32, 3)).copy())
        out = np.asarray(_shared_geo(jax.random.PRNGKey(2), img, cfg))
        assert np.abs(out - out[:1]).max() < 1e-5

    def test_shared_between_views(self):
        """transform1 is drawn ONCE per image: with photometrics and the
        view crop disabled, the two views must be identical."""
        cfg = self._cfg(img_size=24, geo_out=24)  # crop size == geo out
        aug = make_device_twoview_augment(cfg)
        batch = jnp.asarray(np.random.default_rng(1).uniform(
            0, 1, (2, 32, 32, 3)).astype(np.float32))
        v1, v2 = aug(jax.random.PRNGKey(0), batch)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   atol=1e-6)
        assert v1.shape == (2, 24, 24, 3)

    def test_registry_builds_geo_cfg(self, tmp_path):
        """shapes datasets with --device_geometric get a geo cfg and a
        reduced host t1 (Resize only) on the two-view loaders."""
        from types import SimpleNamespace as NS
        from count_pipnet_tpu.data.generate_shapes import \
            GeometricShapesGenerator
        from count_pipnet_tpu.data.registry import get_dataloaders

        out = tmp_path / "data/geometric_shapes/dataset"
        GeometricShapesGenerator({
            "output_dir": str(out), "img_size": 64,
            "train_samples_per_class": 2, "test_samples_per_class": 1,
            "seed": 0,
            "class_definitions": [("circle", 1), ("triangle", 2)],
            "size_mean": 12, "size_std": 2, "min_object_size": 8,
            "max_object_size": 16,
        }).generate_dataset()
        args = NS(dataset="geometric_shapes", image_size=64, batch_size=2,
                  batch_size_pretrain=2, num_workers=0, seed=1,
                  validation_size=0.0, weighted_loss=False,
                  disable_pretrained=True, device_augment=True,
                  device_geometric=True, cache_decoded=False)
        loaders = get_dataloaders(args, basepath=str(tmp_path))
        tl = loaders[0]
        cfg = tl.device_augment_cfg
        assert cfg is not None and cfg.geo
        assert cfg.geo_out == 72 and cfg.geo_rot == 10.0
        assert cfg.geo_canvas == 96
        tl.set_epoch(0)
        xs, ys = next(iter(tl))
        # host ships the RAW decoded image, uint8 (Resize folded into
        # the device resample)
        assert xs.shape == (2, 64, 64, 3) and xs.dtype == np.uint8
        aug = make_device_twoview_augment(cfg)
        v1, v2 = aug(jax.random.PRNGKey(0), jnp.asarray(xs))
        assert v1.shape == (2, 64, 64, 3)
        assert not np.allclose(np.asarray(v1), np.asarray(v2))

    def test_canvas_resize_folded_into_resample(self):
        """geo_canvas: with rot=0 + scale=(1,1) the composed map is a
        plain bilinear upscale source->canvas; interior must match
        jax.image.resize (borders differ: fill-blend vs edge-clamp)."""
        from count_pipnet_tpu.data.device_augment import _shared_geo
        cfg = self._cfg(geo_rot=0.0, geo_scale=(1.0, 1.0), geo_out=64,
                        geo_canvas=64)
        img = jnp.asarray(np.random.default_rng(3).uniform(
            0, 1, (32, 32, 3)).astype(np.float32))
        out = np.asarray(_shared_geo(jax.random.PRNGKey(0), img, cfg))
        ref = np.asarray(jax.image.resize(img, (64, 64, 3), "linear"))
        np.testing.assert_allclose(out[2:-2, 2:-2], ref[2:-2, 2:-2],
                                   atol=1e-5)
