"""Pallas TPU kernel: Gumbel-hard prototype counting head.

Count-PIPNet's inference head with gumbel_softmax(hard=True) is
    counts[b, p] = #patches where argmax(logits[b, patch, :] + gumbel) == p
(reference count_pipnet_utils.py:23-38 + count_pipnet.py:88: hard one-hot
samples summed over space — i.e. a histogram of noisy argmaxes; the
temperature cancels inside argmax). The XLA path materializes the
[B, H, W, P] one-hot proto maps and a same-shaped fp32 Gumbel noise tensor
(threefry) in HBM — ~20 ms at batch 256. This kernel generates the noise
with the on-core PRNG (pltpu.prng_random_bits), takes the argmax and
accumulates the histogram without leaving VMEM.

Note on RNG parity: the noise stream differs from jax.random.gumbel (TPU
hardware PRNG vs threefry) but is i.i.d. Gumbel(0,1) all the same —
matching the reference's "statistical parity" contract for stochastic
paths (SURVEY.md §7 hard parts #4).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gumbel_hard_counts", "gumbel_hard_counts_reference"]

TILE_HW = 128
BATCH_TILE = 8


def _histogram_body(t, logits, gumbel, out_ref, *, n_patches, tile_hw, bt,
                    th, c):
    noisy = logits + gumbel
    winner = jnp.argmax(noisy, axis=1)                    # [bt*th]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (bt * th, c), 1)
              == winner[:, None]).astype(jnp.float32)

    patch_idx = jax.lax.broadcasted_iota(jnp.int32, (bt * th, c), 0) % th
    valid = (patch_idx + t * tile_hw) < n_patches
    onehot = jnp.where(valid, onehot, 0.0)

    out_ref[:] = out_ref[:] + jnp.sum(onehot.reshape(bt, th, c), axis=1)


def _kernel(seed_ref, x_ref, out_ref, *, n_patches, tile_hw):
    """On-core PRNG variant (real TPU)."""
    bi = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    pltpu.prng_seed(seed_ref[0] + bi * nt + t)

    bt, th, c = x_ref.shape
    logits = x_ref[:].reshape(bt * th, c).astype(jnp.float32)

    bits = pltpu.prng_random_bits((bt * th, c))
    # uniform (0, 1): top 24 bits -> int32 (sign-safe below 2^24; Mosaic
    # has no uint32->float cast) -> float mantissa
    top = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32)
    u = top.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-12
    gumbel = -jnp.log(-jnp.log(u))
    _histogram_body(t, logits, gumbel, out_ref, n_patches=n_patches,
                    tile_hw=tile_hw, bt=bt, th=th, c=c)


def _kernel_noise(x_ref, noise_ref, out_ref, *, n_patches, tile_hw):
    """Injected-noise variant (CPU-testable: pltpu.prng has no CPU
    interpreter lowering)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    bt, th, c = x_ref.shape
    logits = x_ref[:].reshape(bt * th, c).astype(jnp.float32)
    gumbel = noise_ref[:].reshape(bt * th, c).astype(jnp.float32)
    _histogram_body(t, logits, gumbel, out_ref, n_patches=n_patches,
                    tile_hw=tile_hw, bt=bt, th=th, c=c)


def gumbel_hard_counts(feats, seed, *, tile_hw: int = TILE_HW,
                       batch_tile: int = BATCH_TILE,
                       interpret: bool = False, noise=None):
    """[B, H, W, P] logits -> [B, P] gumbel-hard prototype counts.

    Args:
      feats: backbone (+ optional 1x1 conv) outputs, any float dtype.
      seed: int32 scalar PRNG seed (on-core PRNG path).
      noise: optional pre-drawn Gumbel noise of feats' shape — used by
        CPU tests (the on-core PRNG has no CPU interpreter lowering).
    """
    import os

    btch, h, wd, c = feats.shape
    n_patches = h * wd
    x = feats.reshape(btch, n_patches, c)

    num_tiles = pl.cdiv(n_patches, tile_hw)
    num_btiles = pl.cdiv(btch, batch_tile)
    pad_b = num_btiles * batch_tile - btch
    # Default: NO pad on the patch axis and NO host-level f32 cast. The
    # device trace (BENCH_NOTES round 5) showed the XLA-side pad 676->768
    # + bf16->f32 convert costing 1.34 ms/step at batch 256 — pure HBM
    # traffic the kernel can absorb for free. The ragged last tile reads
    # out-of-bounds rows (Mosaic masks them); their argmax is garbage but
    # _histogram_body's `valid` mask already zeroes every patch row
    # >= n_patches before accumulation, so the result is unchanged. The
    # f32 cast happens per-tile in VMEM on load. GUMBEL_HEAD_PADDED=1
    # restores the padded/f32 host-side prep (pre-round-5 behavior) in
    # case a toolchain change breaks ragged tiles on real TPU.
    padded = os.environ.get("GUMBEL_HEAD_PADDED", "1") == "1"
    pad_hw = (num_tiles * tile_hw - n_patches) if padded else 0
    if pad_b or pad_hw:
        x = jnp.pad(x, ((0, pad_b), (0, pad_hw), (0, 0)))
    if padded:
        x = x.astype(jnp.float32)

    space = pl.ANY if interpret else pltpu.VMEM
    tile_spec = pl.BlockSpec((batch_tile, tile_hw, c),
                             lambda bi, t: (bi, t, 0), memory_space=space)
    out_spec = pl.BlockSpec((batch_tile, c), lambda bi, t: (bi, 0),
                            memory_space=space)
    out_shape = jax.ShapeDtypeStruct((num_btiles * batch_tile, c),
                                     jnp.float32)

    if noise is not None:
        nz = noise.reshape(btch, n_patches, c)
        if pad_b or pad_hw:
            nz = jnp.pad(nz, ((0, pad_b), (0, pad_hw), (0, 0)))
        if padded:
            nz = nz.astype(jnp.float32)
        kernel = functools.partial(_kernel_noise, n_patches=n_patches,
                                   tile_hw=tile_hw)
        out = pl.pallas_call(
            kernel, grid=(num_btiles, num_tiles),
            in_specs=[tile_spec, tile_spec], out_specs=out_spec,
            out_shape=out_shape, interpret=interpret,
        )(x, nz)
        return out[:btch]

    kernel = functools.partial(_kernel, n_patches=n_patches,
                               tile_hw=tile_hw)
    out = pl.pallas_call(
        kernel,
        grid=(num_btiles, num_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), tile_spec],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), x)
    return out[:btch]


def gumbel_hard_counts_reference(feats, key):
    """XLA reference: jax.random gumbel-hard one-hot summed over space."""
    from ..gumbel import gumbel_softmax
    proto = gumbel_softmax(key, feats.astype(jnp.float32), tau=1.0,
                           hard=True, axis=-1)
    return jnp.sum(proto, axis=(1, 2))
