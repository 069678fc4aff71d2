"""Device-side two-view photometric augmentation.

The reference applies all augmentation on host CPU through torchvision
(util/data.py); on a TPU host the photometric second-stage transform —
two independent draws of ColorJitter + RandomCrop (+ GaussianNoise) +
Normalize per image (util/data.py:596-617 two-view contract) — is pure
element-wise math that the accelerator does for free. This module is the
SURVEY.md §7 step-3 option "move normalize + noise to device": the host
loader performs only decode + the shared geometric transform1 and ships
one slightly-oversized float image per sample; both views come out of a
single jitted call.

Semantics parity (per view):
  brightness: img * f,   f ~ U[1-b, 1+b]        (PIL Brightness)
  contrast:   (img - gray_mean) * f + gray_mean (PIL Contrast)
  random crop to img_size
  gaussian noise with probability p (kornia RandomGaussianNoise,
    util/data.py:346-410)
  ImageNet normalization
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .augment import IMAGENET_MEAN, IMAGENET_STD

__all__ = ["DeviceAugmentConfig", "make_device_twoview_augment"]

_GRAY = jnp.asarray([0.299, 0.587, 0.114])


class DeviceAugmentConfig(NamedTuple):
    img_size: int
    brightness: float = 0.1
    contrast: float = 0.1
    noise_std: float = 0.0       # 0 disables (shapes-GN recipes use 0.1)
    noise_p: float = 0.5


def _one_view(key, img, cfg: DeviceAugmentConfig):
    """img: [H, W, 3] float in [0, 1] (t1 output, H = img_size + margin)."""
    kb, kc, kx, ky, kn, kp = jax.random.split(key, 6)
    h, w, _ = img.shape
    s = cfg.img_size

    if cfg.brightness > 0:
        f = jax.random.uniform(kb, (), minval=max(0.0, 1 - cfg.brightness),
                               maxval=1 + cfg.brightness)
        img = img * f
    if cfg.contrast > 0:
        f = jax.random.uniform(kc, (), minval=max(0.0, 1 - cfg.contrast),
                               maxval=1 + cfg.contrast)
        mean = jnp.mean(img @ _GRAY)
        img = (img - mean) * f + mean
    img = jnp.clip(img, 0.0, 1.0)

    ox = jax.random.randint(kx, (), 0, max(w - s, 0) + 1)
    oy = jax.random.randint(ky, (), 0, max(h - s, 0) + 1)
    img = jax.lax.dynamic_slice(img, (oy, ox, 0), (s, s, 3))

    if cfg.noise_std > 0:
        noise = cfg.noise_std * jax.random.normal(kn, img.shape)
        apply = jax.random.bernoulli(kp, cfg.noise_p)
        img = img + jnp.where(apply, 1.0, 0.0) * noise

    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (img - mean) / std


def make_device_twoview_augment(cfg: DeviceAugmentConfig):
    """Build a jitted (key, batch [B, H, W, 3] in [0,1]) ->
    (view1, view2) function — the device-side transform2 applied twice
    with independent draws (the two-view contract,
    reference util/data.py:596-617)."""

    @jax.jit
    def augment(key, batch):
        if jnp.issubdtype(batch.dtype, jnp.integer):
            # uint8 transport (data/augment.ToUint8Array): exactly
            # ToArray's float value once divided by 255
            batch = batch.astype(jnp.float32) / 255.0
        b = batch.shape[0]
        k1, k2 = jax.random.split(key)
        keys1 = jax.random.split(k1, b)
        keys2 = jax.random.split(k2, b)
        v1 = jax.vmap(_one_view, in_axes=(0, 0, None))(keys1, batch, cfg)
        v2 = jax.vmap(_one_view, in_axes=(0, 0, None))(keys2, batch, cfg)
        return v1, v2

    return augment
