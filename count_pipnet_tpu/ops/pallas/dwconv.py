"""Pallas TPU kernel: depthwise 7x7 convolution (ConvNeXt block opener).

XLA lowers NHWC depthwise convs poorly on TPU (~1.4 TFLOP/s measured: a
single 56x56x96 dwconv at batch 256 takes 5.3 ms); across ConvNeXt-Tiny's
18 blocks that is ~60 ms of the 138 ms inference step. The op itself is
just 49 shifted fused multiply-adds over the image plane — pure VPU work
with one read and one write. This kernel keeps the (padded) plane in VMEM
and unrolls the 49 taps as static slices.

Grid = (B,); each step owns one image plane (all ConvNeXt-Tiny planes fit:
the largest is 62x62x96 fp32 ~ 1.5 MB padded).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dwconv7"]

K = 7
PAD = 3


def _kernel(x_ref, w_ref, b_ref, out_ref, *, h, w):
    xp = x_ref[0].astype(jnp.float32)          # [H+6, W+6, C]
    acc = jnp.zeros((h, w, xp.shape[-1]), jnp.float32)
    for dy in range(K):
        for dx in range(K):
            tap = w_ref[dy * K + dx]           # [1, C] -> broadcasts
            acc = acc + xp[dy:dy + h, dx:dx + w, :] * tap
    out_ref[0] = (acc + b_ref[0]).astype(out_ref.dtype)


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
    xp = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    wk = jnp.asarray(kernel, jnp.float32).reshape(K * K, c)

    kern = functools.partial(_kernel, h=h, w=w)
    space = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h + 2 * PAD, w + 2 * PAD, c),
                         lambda i: (i, 0, 0, 0), memory_space=space),
            pl.BlockSpec((K * K, c), lambda i: (0, 0),
                         memory_space=space),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=space),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=space),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), out_dtype),
        interpret=interpret,
    )(xp, wk, jnp.asarray(bias, jnp.float32).reshape(1, c))
    return out
