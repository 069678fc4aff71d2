"""Device-side two-view augmentation (photometric, optionally geometric).

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

``geo=True`` additionally moves the SHARED geometric transform1 of the
synthetic shapes recipes on device (--device_geometric): the host ships
the Resize(img+32) canvas and the device composes RandomRotation
(fill=white) + torchvision-sampling RandomResizedCrop into ONE bilinear
resample per image, drawn once and applied to both views (the two-view
contract keeps transform1 shared, util/data.py:596-617). Measured ~10x
less host CPU per image on a 1-core TPU host (BENCH_NOTES.md).
Distributional parity, not pixel parity: the host chain resamples twice
(NEAREST rotate, then bilinear crop-resize) where the device samples
once.
"""

from typing import NamedTuple, Tuple

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
    # -- device-side shared transform1 (--device_geometric) --------------
    geo: bool = False
    geo_rot: float = 0.0         # RandomRotation(degrees)
    geo_out: int = 0             # RandomResizedCrop output side (img+8)
    geo_scale: Tuple[float, float] = (1.0, 1.0)   # RRC area fraction
    geo_ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0)
    geo_fill: float = 1.0        # rotation fill, [0,1] (white = 255/255)
    geo_canvas: int = 0          # Resize(img+32) side; 0 = input IS the
    #                              canvas. When set, the host ships the
    #                              RAW decoded image and the Resize is
    #                              folded into the same resample (plain
    #                              bilinear — fine for the synthetic
    #                              upscale case, no antialias for big
    #                              downscales).


def _bilinear_fill(img, ys, xs, fill):
    """Bilinear sample of img [H, W, 3] at float coords (ys, xs) [h, w];
    out-of-bounds taps contribute ``fill``."""
    h, w, _ = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = (ys - y0)[..., None]
    fx = (xs - x0)[..., None]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def tap(yi, xi):
        inb = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))[..., None]
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inb, v, fill)

    top = tap(y0, x0) * (1 - fx) + tap(y0, x0 + 1) * fx
    bot = tap(y0 + 1, x0) * (1 - fx) + tap(y0 + 1, x0 + 1) * fx
    return top * (1 - fy) + bot * fy


def _shared_geo(key, img, cfg: DeviceAugmentConfig):
    """Device transform1 for the shapes recipes: RandomRotation(geo_rot,
    fill) then RandomResizedCrop(geo_out, geo_scale, geo_ratio), composed
    into one bilinear resample of the [S1, S1, 3] canvas.

    RRC sampling mirrors torchvision (data/augment.py RandomResizedCrop):
    10 (area, log-aspect) candidates, first in-bounds one wins, center
    full-frame fallback; rotation is about the canvas center with the
    out-of-frame region filled (reference shapes recipe uses fill=255,
    util/data.py:292-343)."""
    ka, ks, kr, kx, ky = jax.random.split(key, 5)
    s1 = cfg.geo_canvas if cfg.geo_canvas else img.shape[0]
    out = cfg.geo_out

    theta = jax.random.uniform(
        ka, (), minval=-cfg.geo_rot, maxval=cfg.geo_rot) * (jnp.pi / 180.0)

    scales = jax.random.uniform(ks, (10,), minval=cfg.geo_scale[0],
                                maxval=cfg.geo_scale[1])
    la0, la1 = jnp.log(jnp.asarray(cfg.geo_ratio[0])), jnp.log(
        jnp.asarray(cfg.geo_ratio[1]))
    aspects = jnp.exp(jax.random.uniform(kr, (10,), minval=la0,
                                         maxval=la1))
    cw = jnp.round(s1 * jnp.sqrt(scales * aspects))
    ch = jnp.round(s1 * jnp.sqrt(scales / aspects))
    valid = (cw > 0) & (ch > 0) & (cw <= s1) & (ch <= s1)
    i = jnp.argmax(valid)  # first valid candidate
    any_valid = jnp.any(valid)
    cw_i = jnp.where(any_valid, cw[i], float(s1))
    ch_i = jnp.where(any_valid, ch[i], float(s1))
    # torchvision randint(0, s1-cw) inclusive
    x0 = jnp.floor(jax.random.uniform(kx) * (s1 - cw_i + 1.0))
    y0 = jnp.floor(jax.random.uniform(ky) * (s1 - ch_i + 1.0))

    # output grid -> crop coords (half-pixel centers) -> unrotate
    u = (jnp.arange(out) + 0.5) * (cw_i / out) - 0.5 + x0
    v = (jnp.arange(out) + 0.5) * (ch_i / out) - 0.5 + y0
    xg, yg = jnp.meshgrid(u, v)
    c = (s1 - 1) / 2.0
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    xs = c + cos_t * (xg - c) - sin_t * (yg - c)
    ys = c + sin_t * (xg - c) + cos_t * (yg - c)
    h0, w0 = img.shape[0], img.shape[1]
    if h0 != s1 or w0 != s1:
        # fold the host Resize(canvas) into the same resample:
        # canvas coords -> source coords (half-pixel centers)
        xs = (xs + 0.5) * (w0 / s1) - 0.5
        ys = (ys + 0.5) * (h0 / s1) - 0.5
    return _bilinear_fill(img, ys, xs, cfg.geo_fill)


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
        if cfg.geo:
            # shared transform1: ONE draw per image, both views see it
            # (two-view contract, util/data.py:596-617)
            key, kg = jax.random.split(key)
            gkeys = jax.random.split(kg, b)
            batch = jax.vmap(_shared_geo, in_axes=(0, 0, None))(
                gkeys, batch, cfg)
        k1, k2 = jax.random.split(key)
        keys1 = jax.random.split(k1, b)
        keys2 = jax.random.split(k2, b)
        v1 = jax.vmap(_one_view, in_axes=(0, 0, None))(keys1, batch, cfg)
        v2 = jax.vmap(_one_view, in_axes=(0, 0, None))(keys2, batch, cfg)
        return v1, v2

    return augment
