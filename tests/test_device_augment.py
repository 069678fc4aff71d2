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
