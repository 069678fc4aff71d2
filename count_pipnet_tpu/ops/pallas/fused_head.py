"""Pallas TPU kernel: fused prototype head for Count-PIPNet inference.

The Count-PIPNet inference head is
    backbone features [B, H, W, C]
      -> 1x1 conv (C -> P)            (a matmul over the channel dim, MXU)
      -> softmax over P per patch     (VPU)
      -> sum over (H, W) = counts     (VPU reduction)
(reference pipnet/count_pipnet.py:82-88). Executed naively this
materializes the [B, H, W, P] prototype maps in HBM — at B=256, 26x26
latents and P=768 that is ~0.5 GB of pure bandwidth per step that the
classification path never needs. This kernel keeps each tile's logits in
VMEM: one MXU matmul per (batch-tile, HW-tile) grid step, softmax in
registers, counts accumulated into the [BATCH_TILE, P] output block.

Tiling (TPU constraints: last-two block dims divisible by (8, 128)):
grid = (B / BATCH_TILE, HW / TILE_HW); x block [BATCH_TILE, TILE_HW, C];
out block [BATCH_TILE, P] revisited across the HW-tile dimension.
Remainder patches are masked; batch is padded to BATCH_TILE.

Used by the serving fast path (models/serving.py) with softmax activation;
the Gumbel-noise training path keeps the XLA implementation (it needs the
full proto maps for the align loss anyway).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_count_head", "fused_count_head_reference"]

TILE_HW = 128
BATCH_TILE = 8


def _kernel(x_ref, w_ref, b_ref, out_ref, *, n_patches, tile_hw,
            batch_tile):
    """Grid = (num_batch_tiles, num_hw_tiles).
    x block: [batch_tile, tile_hw, C]; w: [C, P]; b: [1, P];
    out block: [batch_tile, P] accumulated across the hw-tile dim."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    bt, th, c = x_ref.shape
    p = w_ref.shape[1]
    x = x_ref[:].reshape(bt * th, c)
    logits = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
    logits = logits + b_ref[:]

    # softmax over prototypes per patch (fp32 in VMEM)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    probs = e / jnp.sum(e, axis=1, keepdims=True)

    # mask remainder patches of the last hw tile
    patch_idx = jax.lax.broadcasted_iota(jnp.int32, (bt * th, p), 0) % th
    valid = (patch_idx + t * tile_hw) < n_patches
    probs = jnp.where(valid, probs, 0.0)

    out_ref[:] = out_ref[:] + jnp.sum(
        probs.reshape(bt, th, p), axis=1)


def fused_count_head(features, w, b, *, tile_hw: int = TILE_HW,
                     batch_tile: int = BATCH_TILE,
                     interpret: bool = False):
    """Counts [B, P] from backbone features without materializing proto
    maps.

    Args:
      features: [B, H, W, C] (any float dtype; accumulated in fp32).
      w: [C, P] 1x1-conv kernel.
      b: [P] bias.

    Returns:
      [B, P] float32 prototype counts (sum of per-patch softmax).
    """
    btch, h, wd, c = features.shape
    p = w.shape[1]
    n_patches = h * wd
    x = features.reshape(btch, n_patches, c)

    num_tiles = pl.cdiv(n_patches, tile_hw)
    pad_hw = num_tiles * tile_hw - n_patches
    num_btiles = pl.cdiv(btch, batch_tile)
    pad_b = num_btiles * batch_tile - btch
    if pad_hw or pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, pad_hw), (0, 0)))

    kernel = functools.partial(_kernel, n_patches=n_patches,
                               tile_hw=tile_hw, batch_tile=batch_tile)
    out = pl.pallas_call(
        kernel,
        grid=(num_btiles, num_tiles),
        in_specs=[
            pl.BlockSpec((batch_tile, tile_hw, c),
                         lambda bi, t: (bi, t, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((c, p), lambda bi, t: (0, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((1, p), lambda bi, t: (0, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch_tile, p), lambda bi, t: (bi, 0),
                               memory_space=pl.ANY
                               if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_btiles * batch_tile, p),
                                       jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.float32), w.astype(jnp.float32),
      b.astype(jnp.float32).reshape(1, p))
    return out[:btch]


def fused_count_head_reference(features, w, b):
    """XLA reference implementation (for parity tests and as fallback)."""
    btch, h, wd, c = features.shape
    x = features.reshape(btch, h * wd, c).astype(jnp.float32)
    logits = x @ w.astype(jnp.float32) + b.astype(jnp.float32)[None, None]
    probs = jax.nn.softmax(logits, axis=-1)
    return probs.sum(axis=1)
