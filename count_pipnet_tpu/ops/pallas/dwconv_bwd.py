"""Pallas TPU kernel: depthwise-conv 7x7 weight gradient (training).

Motivation: in the ``--fused_blocks`` training path the ConvNeXt block
MLP already runs through Pallas forward/backward kernels, leaving the
depthwise conv on XLA. XLA lowers the depthwise WEIGHT gradient as a
batch-grouped convolution whose effective contraction shape maps terribly
onto the MXU (measured: wgrad is several times the cost of the forward at
training shapes — see BENCH_NOTES.md round 3). The data gradient (dgrad)
is itself a depthwise conv with a flipped kernel and lowers fine.

This kernel computes dK and db on the zero-padded plane layout of
``ops/pallas/fused_block.py``:

    dK[ky, kx, c] = sum_{b,y,x} x[b, y+ky-3, x+kx-3, c] * g[b, y, x, c]
                  = sum_rows  xslice(ky) * roll(g, kx-3)

* vertical taps ky: 8-aligned static row slices of the padded x plane
  (the vertical zero-pad IS the halo);
* horizontal taps kx: 7 unmasked ``pltpu.roll``s of the padded gradient
  plane (zeros flow in from the >=3 right-pad columns), hoisted out of
  the ky loop — 7 rolls + 49 multiply-reduces per image, the same
  mathematical-minimum structure as the forward ``_dwconv_pad``;
* the batch is the (sequential) grid; per-tap row-sums accumulate into a
  single [56, C] f32 output block (rows 0..48 = taps, row 49 = bias
  grad, rows 50..55 zero padding for sublane alignment).

Reference contract: torch autograd of nn.Conv2d(groups=C) inside the
reference training loop (reference pipnet/train.py:75-138); numerics are
validated against jax.vjp of the XLA conv in tests/test_dwconv_bwd.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dwconv import dwconv7
from .fused_block import K, PAD, _wp_for, pad_planes

__all__ = ["dwconv7_wgrad", "dwconv7_ad", "dwconv7_pfwd_ad"]

_ROWS = 56  # 49 taps + 1 bias row, padded to a sublane multiple


def _wgrad_kernel(xp_ref, gp_ref, out_ref, *, h, wp):
    i = pl.program_id(0)
    hwp = h * wp
    padr = PAD * wp
    xp = xp_ref[0].astype(jnp.float32)          # [(h+6)*wp, C]
    gi = gp_ref[0][padr:padr + hwp].astype(jnp.float32)  # interior rows
    c = xp.shape[-1]

    # kx outer so only ONE rolled f32 gradient plane is live at a time
    # (hoisting all 7 rolls costs ~9 MB VMEM at stage-1 geometry — over
    # the 16 MB scoped limit). gs[r] = gi[r - (kx-3)]; the zero pad
    # columns make the rolled-in values exact.
    rows = [None] * (K * K)
    for kx in range(K):
        sd = kx - PAD
        gs = pltpu.roll(gi, sd % hwp, axis=0) if sd else gi
        for ky in range(K):
            xs = xp[ky * wp:ky * wp + hwp]
            rows[ky * K + kx] = jnp.sum(xs * gs, axis=0, keepdims=True)
    rows.append(jnp.sum(gi, axis=0, keepdims=True))          # bias grad
    block = jnp.concatenate(
        rows + [jnp.zeros((_ROWS - len(rows), c), jnp.float32)], axis=0)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = block

    @pl.when(i > 0)
    def _acc():
        out_ref[:] = out_ref[:] + block


def dwconv7_wgrad(x4, g4, *, interpret: bool = False):
    """dK, db of a 7x7 depthwise conv (stride 1, SAME padding 3).

    x4: [B, H, W, C] input; g4: [B, H, W, C] output cotangent.
    Returns (dk [7, 7, 1, C] f32, db [C] f32).
    """
    b, h, w, c = x4.shape
    wp = _wp_for(w)
    xp = pad_planes(x4, wp)
    gp = pad_planes(g4, wp)
    tot = (h + 2 * PAD) * wp

    space = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        functools.partial(_wgrad_kernel, h=h, wp=wp),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, tot, c), lambda i: (i, 0, 0),
                         memory_space=space),
            pl.BlockSpec((1, tot, c), lambda i: (i, 0, 0),
                         memory_space=space),
        ],
        out_specs=pl.BlockSpec((_ROWS, c), lambda i: (0, 0),
                               memory_space=space),
        out_shape=jax.ShapeDtypeStruct((_ROWS, c), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xp, gp)
    dk = out[:K * K].reshape(K, K, 1, c)
    db = out[K * K]
    return dk, db


def _dw_conv(x, kernel, bias, dtype):
    """The forward depthwise conv exactly as flax nn.Conv runs it
    (promote to ``dtype``, HWIO kernel [7,7,1,C], groups=C, bias add)."""
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), window_strides=(1, 1),
        padding=((PAD, PAD), (PAD, PAD)), feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def dwconv7_ad(x, kernel, bias, dtype, use_pallas):
    """Depthwise 7x7 conv with XLA forward/dgrad and Pallas wgrad.

    Forward numerics are IDENTICAL to flax nn.Conv (same XLA op); only
    the weight/bias gradient computation is replaced. ``use_pallas=False``
    (CPU/tests) computes the wgrad with the same tap/row-sum algorithm in
    pure jnp for bit-level comparability.
    """
    return _dw_conv(x, kernel, bias, dtype)


def _ad_fwd(x, kernel, bias, dtype, use_pallas):
    return _dw_conv(x, kernel, bias, dtype), (x, kernel)


def _ad_bwd(dtype, use_pallas, res, g):
    x, kernel = res
    c = x.shape[-1]
    # dgrad: depthwise conv of g with the spatially flipped kernel —
    # XLA lowers this as well as the forward.
    dx = jax.lax.conv_general_dilated(
        g.astype(dtype), kernel[::-1, ::-1].astype(dtype),
        window_strides=(1, 1), padding=((PAD, PAD), (PAD, PAD)),
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if use_pallas:
        dk, db = dwconv7_wgrad(x.astype(dtype), g.astype(dtype))
    else:
        # same algorithm in jnp (CPU fallback / interpret-free testing)
        xs = jnp.pad(x.astype(jnp.float32),
                     ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
        g32 = g.astype(jnp.float32)
        h, w = x.shape[1], x.shape[2]
        taps = []
        for ky in range(K):
            for kx in range(K):
                taps.append(jnp.sum(
                    xs[:, ky:ky + h, kx:kx + w] * g32, axis=(0, 1, 2)))
        dk = jnp.stack(taps).reshape(K, K, 1, c)
        db = jnp.sum(g32, axis=(0, 1, 2))
    return (dx.astype(x.dtype), dk.astype(kernel.dtype),
            db.astype(kernel.dtype))


dwconv7_ad.defvjp(_ad_fwd, _ad_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def dwconv7_pfwd_ad(x, kernel, bias, dtype, use_pallas):
    """Depthwise 7x7 conv with the PALLAS forward and XLA backward.

    The complement of :func:`dwconv7_ad`: XLA's depthwise dgrad AND wgrad
    measured fine at training shapes (BENCH_NOTES.md round 3), but its
    *forward* lowering is the slow piece at serving shapes — this wrapper
    runs the channels-to-lanes Pallas forward (ops/pallas/dwconv.dwconv7)
    and keeps both gradients on XLA's conv vjp. Gradient correctness does
    not depend on the forward implementation (the conv is linear in both
    operands), so grads are bit-identical to flax nn.Conv's.

    ``use_pallas=False`` (CPU/tests) falls back to the XLA forward, making
    the wrapper a drop-in for nn.Conv in either environment.
    """
    if use_pallas:
        return dwconv7(x.astype(dtype), kernel, bias, out_dtype=dtype)
    return _dw_conv(x, kernel, bias, dtype)


def _pfwd_fwd(x, kernel, bias, dtype, use_pallas):
    return dwconv7_pfwd_ad(x, kernel, bias, dtype, use_pallas), (x, kernel)


def _pfwd_bwd(dtype, use_pallas, res, g):
    x, kernel = res
    _, vjp_fn = jax.vjp(
        lambda xx, kk, bb: _dw_conv(xx, kk, bb, dtype), x, kernel,
        jnp.zeros((x.shape[-1],), kernel.dtype))
    dx, dk, db = vjp_fn(g.astype(dtype))
    return dx.astype(x.dtype), dk.astype(kernel.dtype), db


dwconv7_pfwd_ad.defvjp(_pfwd_fwd, _pfwd_bwd)
