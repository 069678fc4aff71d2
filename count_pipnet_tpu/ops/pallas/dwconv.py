"""Pallas TPU kernel: depthwise 7x7 convolution (ConvNeXt block opener).

XLA lowers NHWC depthwise convs poorly on TPU (~55-108 GB/s effective,
4-6 ms for one block-opener plane at batch 256 — 13x off the bandwidth
bound); across the stride-surgery ConvNeXt-Tiny's 18 blocks that is
~85 ms of the ~137 ms inference forward. The op is 49 shifted
multiply-adds over the image plane — pure VPU work with one HBM read and
one write.

Round-1 attempt (kept in git history) unrolled 49 spatially-offset 3D
slices of an XLA-padded plane; the unaligned sublane offsets forced a
vector relayout per tap and came out 2.5x SLOWER than XLA. This version
fixes both problems (the BENCH_NOTES.md "channels-to-lanes + roll" plan):

* channels stay in lanes, W in sublanes, (batch, H) in untiled leading
  dims — vertical taps dy become *free* leading-dim slices;
* the 49 taps are grouped by horizontal offset dx: the 7 vertical
  partial sums cost 49 FMAs with no data movement, then ONE
  lane-preserving ``pltpu.roll`` along W + column edge mask per dx
  (7 rolls total instead of 49 shifted slices);
* the halo is built inside VMEM scratch at leading-dim offsets (free),
  so there is no XLA pre-pad pass over the plane.

Grid = (B / batch_tile, C / 128-lane tile); batch_tile is sized to a
~8 MB VMEM budget.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dwconv7"]

K = 7
PAD = 3
_VMEM_BUDGET = 5 * 1024 * 1024


def _kernel(x_ref, w_ref, b_ref, out_ref, xp_ref, *, h, w):
    bt = x_ref.shape[0]
    ct = x_ref.shape[-1]
    # Build the H halo in scratch: leading-dim offsets are untiled -> free.
    xp_ref[:, :PAD] = jnp.zeros((bt, PAD, w, ct), xp_ref.dtype)
    xp_ref[:, h + PAD:] = jnp.zeros((bt, PAD, w, ct), xp_ref.dtype)
    xp_ref[:, PAD:h + PAD] = x_ref[:].astype(xp_ref.dtype)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2)
    acc = jnp.broadcast_to(b_ref[0].astype(jnp.float32), (bt, h, w, ct))
    for dx in range(K):
        # vertical partial sum for this dx: 7 FMAs, dy slices are free
        vs = xp_ref[:, 0:h] * w_ref[dx]  # dy = 0
        for dy in range(1, K):
            vs = vs + xp_ref[:, dy:dy + h] * w_ref[dy * K + dx]
        # horizontal shift: out[w] = vs[w + dx - 3]
        shift = PAD - dx
        if shift != 0:
            vs = pltpu.roll(vs, shift % w, axis=2)  # roll wants shift >= 0
            mask = jnp.logical_and(col >= max(shift, 0),
                                   col < w + min(shift, 0))
            vs = jnp.where(mask, vs, 0.0)
        acc = acc + vs
    out_ref[:] = acc.astype(out_ref.dtype)


def _pick_batch_tile(b, h, w, c_tile, elt):
    """Largest divisor of b whose VMEM footprint fits the budget."""
    # xp scratch + double-buffered in/out + f32 acc/vs spills
    per_img = ((h + 2 * PAD) * w * elt + 4 * h * w * elt
               + 2 * h * w * 4) * c_tile
    bt = max(1, _VMEM_BUDGET // per_img)
    while b % bt:
        bt -= 1
    return bt


def dwconv7(x, kernel, bias, *, out_dtype=None, interpret: bool = False):
    """Depthwise 7x7, stride 1, SAME padding.

    Args:
      x: [B, H, W, C].
      kernel: [7, 7, 1, C] (flax depthwise layout).
      bias: [C].

    Returns [B, H, W, C] in ``out_dtype`` (default: x.dtype).
    """
    b, h, w, c = x.shape
    out_dtype = out_dtype or x.dtype
    wk = jnp.asarray(kernel, jnp.float32).reshape(K * K, 1, c)

    c_tile = 128 if c % 128 == 0 else c
    # halo scratch keeps the input dtype: bf16 serving stays cheap,
    # fp32 inputs stay exact (training/parity use)
    scratch_dtype = x.dtype
    bt = _pick_batch_tile(b, h, w, c_tile, jnp.dtype(scratch_dtype).itemsize)

    kern = functools.partial(_kernel, h=h, w=w)
    space = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        kern,
        grid=(b // bt, c // c_tile),
        in_specs=[
            pl.BlockSpec((bt, h, w, c_tile), lambda i, j: (i, 0, 0, j),
                         memory_space=space),
            pl.BlockSpec((K * K, 1, c_tile), lambda i, j: (0, 0, j),
                         memory_space=space),
            pl.BlockSpec((1, c_tile), lambda i, j: (0, j),
                         memory_space=space),
        ],
        out_specs=pl.BlockSpec((bt, h, w, c_tile),
                               lambda i, j: (i, 0, 0, j),
                               memory_space=space),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bt, h + 2 * PAD, w, c_tile), scratch_dtype)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(x, wk, jnp.asarray(bias, jnp.float32).reshape(1, c))
    return out
