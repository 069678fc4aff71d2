"""Pallas TPU kernel: a COMPLETE fused ConvNeXt block for serving.

One kernel application = one image plane through a whole block:

    dwconv7x7 -> LayerNorm -> Dense(C->4C) -> GELU(tanh) -> Dense(4C->C)
        -> * layer_scale -> + residual

This supersedes the separate dwconv + fused-MLP path for inference
(ops/pallas/dwconv.py, fused_mlp.py): the depthwise output and the
4C-wide MLP intermediate never touch HBM, and each block moves exactly
one plane in + one plane out (measured effective HBM bandwidth on this
chip is ~450 GB/s, so plane round-trips dominate the un-fused path).

Layout: planes are kept FLATTENED as [B, H*W, C] across a whole stage —
C in lanes, patches in sublanes — so the MLP GEMMs need no in-kernel
reshape. The depthwise conv runs on the flattened axis:

* vertical taps dy: 7 whole-row ``pltpu.roll``s by (dy-3)*W + row masks;
* horizontal taps dx: per-dx vertical partial sums (49 FMAs, the
  mathematical minimum), then 7 rolls by (dx-3) + column edge masks.

Weights live in VMEM across the whole grid (constant index maps).

Two matmul modes (measured, batch 256 per-GEMM rates):
* ``int8=False``: bf16 MXU — 91 TF/s at C=384, 140 TF/s at C=768;
* ``int8=True``: static per-output-channel int8 weights (folded at trace
  time) + dynamic per-row activation quantization inside the kernel —
  105 TF/s at C=384, 207 TF/s at C=768 (the int8 MXU path VERDICT.md
  round-2 item 1 asks for; the XLA dynamic-quant attempt in
  models/quantized.py was slower than bf16).

Reference contract: torchvision CNBlock (ConvNeXt-Tiny), reference
features/convnext_features.py:5-15 (stride surgery keeps these planes at
27x27/26x26 — that resolution is why serving is compute-bound here).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_block_apply", "fused_block_apply_padded",
           "quantize_block_weights", "quantize_block_weights_folded",
           "fused_block_ad", "pad_planes", "unpad_planes",
           "plane_colmask"]

K = 7
PAD = 3


def _dwconv_flat(x, wk, bias, h, w, tap_dtype=jnp.float32):
    """Depthwise 7x7 on a flattened [HW, C] plane (f32 out).

    wk: [49, C] f32; bias [1, C]. ``tap_dtype=bfloat16`` runs the 49 tap
    FMAs and 14 rolls in bf16 (half the VPU shuffle/FMA traffic; the
    per-dx partial sums are then accumulated in f32) — the dwconv is
    ~half of a wide block's kernel time at f32.
    """
    hw = h * w
    row = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0) // w
    col = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0) % w

    wt = wk.astype(tap_dtype)
    # vertical shifts hoisted out of the dx loop: 7 rolls + 7 row masks
    # total (not 49), then the 49 FMAs below are the mathematical minimum.
    # Mosaic's tpu.dynamic_rotate only supports 32-bit data, so the rolls
    # stay f32; only the tap FMAs run in tap_dtype.
    xds = []
    for dy in range(K):
        sh = (dy - PAD) * w
        xd = pltpu.roll(x, (-sh) % hw, axis=0) if sh else x
        rmask = jnp.logical_and(row + (dy - PAD) >= 0,
                                row + (dy - PAD) < h)
        xds.append(jnp.where(rmask, xd, 0.0).astype(tap_dtype))

    acc = jnp.broadcast_to(bias.astype(jnp.float32), (hw, x.shape[-1]))
    for dx in range(K):
        vs = None
        for dy in range(K):
            t = xds[dy] * wt[dy * K + dx]
            vs = t if vs is None else vs + t
        vs = vs.astype(jnp.float32)
        sd = dx - PAD
        if sd:
            vs = pltpu.roll(vs, (-sd) % hw, axis=0)
            cmask = jnp.logical_and(col + sd >= 0, col + sd < w)
            vs = jnp.where(cmask, vs, 0.0)
        acc = acc + vs
    return acc


def _wp_for(w: int) -> int:
    """Lane-friendly padded width: the smallest multiple of 8 >= w+ (so
    vertical-tap slice offsets dy*WP stay 8-aligned) with >= PAD spare
    columns for the unmasked horizontal rolls."""
    wp = ((w + PAD + 7) // 8) * 8
    return wp


def pad_planes(x4, wp=None):
    """[B, H, W, C] -> [B, 3*WP + H*WP + 3*WP, C] zero-padded flattened
    planes (the whole-stage layout for the padded kernels)."""
    b, h, w, c = x4.shape
    wp = wp or _wp_for(w)
    xp = jnp.pad(x4, ((0, 0), (PAD, PAD), (0, wp - w), (0, 0)))
    return xp.reshape(b, (h + 2 * PAD) * wp, c)


def unpad_planes(xp, h, w, wp=None):
    b = xp.shape[0]
    wp = wp or _wp_for(w)
    x = xp[:, PAD * wp:PAD * wp + h * wp].reshape(b, h, wp, -1)
    return x[:, :, :w]


def plane_colmask(h, w, wp=None):
    """[H*WP, 1] f32 0/1 mask of the valid (non-pad) columns."""
    import numpy as np
    wp = wp or _wp_for(w)
    return jnp.asarray(
        (np.arange(h * wp) % wp < w).astype(np.float32).reshape(h * wp, 1))


def _load_padded(x_ref, h, w, wp, pad_in):
    """Kernel prologue: materialize the zero-padded [(H+6)*WP, C] plane.

    ``pad_in=False``: the block input already IS the padded layout (one
    VMEM read). ``pad_in=True``: the block input is the COMPACT
    [1, H, W, C] plane (what the stem / downsample convs emit) and the
    padding is built in VMEM — two concatenates with zeros plus a free
    (WP is sublane-tile-aligned) reshape. This removes the standalone
    XLA pad op at each stage entry (measured 0.70 ms/step for stage 1
    alone at batch 256, BENCH_NOTES round-5 device trace) AND shrinks
    the block's HBM read to the compact plane (-21% at stage-1
    geometry)."""
    if not pad_in:
        return x_ref[0]
    x = x_ref[0]                                        # [h, w, c]
    c = x.shape[-1]
    if wp > w:
        x = jnp.concatenate(
            [x, jnp.zeros((h, wp - w, c), x.dtype)], axis=1)
    x = x.reshape(h * wp, c)
    z = jnp.zeros((PAD * wp, c), x.dtype)
    return jnp.concatenate([z, x, z], axis=0)


def _store_padded(out_ref, res, h, w, wp, unpad_out):
    """Kernel epilogue: write the block result.

    ``unpad_out=False``: restore the zero-pad invariant and write the
    padded layout for the next block. ``unpad_out=True``: write the
    COMPACT [1, H, W, C] plane (what the next downsample conv / head
    consumes) — removes the standalone XLA slice op at each stage exit
    (0.71 + 0.64 ms/step for stages 1-2 at batch 256, BENCH_NOTES
    round-5 device trace) and shrinks the block's HBM write."""
    if unpad_out:
        out_ref[0] = res.reshape(h, wp, -1)[:, :w].astype(out_ref.dtype)
        return
    hwp = h * wp
    padr = PAD * wp
    c = res.shape[-1]
    out_ref[0, padr:padr + hwp] = res.astype(out_ref.dtype)
    out_ref[0, :padr] = jnp.zeros((padr, c), out_ref.dtype)
    out_ref[0, padr + hwp:] = jnp.zeros((padr, c), out_ref.dtype)


def _dwconv_pad(xp, wk, bias, colmask, h, wp, tap_dtype=jnp.float32):
    """Depthwise 7x7 on a zero-padded [3*WP + H*WP + 3*WP, C] plane.

    The padding IS the halo: vertical taps are 8-aligned static slices
    (no rolls, no masks — zeros pre-padded above/below), horizontal taps
    are 7 unmasked ``pltpu.roll``s of the per-dx partial sums (zeros flow
    in from the >=3 pad columns; partial sums at pad columns are exactly
    zero so rolled-in boundary values are correct). One column mask at
    the end restores the pad-column invariant for the next block.

    ``tap_dtype=bfloat16`` runs the 49 tap FMAs in bf16 (vertical taps
    are static slices, so unlike :func:`_dwconv_flat` NO f32 copy of the
    input is needed at all when the plane arrives bf16); each per-dx
    partial sum is cast to f32 before its roll (Mosaic dynamic_rotate is
    32-bit-only) and the cross-dx accumulation stays f32.
    Returns [H*WP, C] f32.
    """
    hwp = h * wp
    c = xp.shape[-1]
    x_t = xp.astype(tap_dtype)
    wk_t = wk.astype(tap_dtype)
    acc = jnp.broadcast_to(bias.astype(jnp.float32), (hwp, c))
    for dx in range(K):
        vs = None
        for dy in range(K):
            t = x_t[dy * wp:dy * wp + hwp] * wk_t[dy * K + dx]
            vs = t if vs is None else vs + t
        vs = vs.astype(jnp.float32)
        sd = dx - PAD
        if sd:
            vs = pltpu.roll(vs, (-sd) % hwp, axis=0)
        acc = acc + vs
    return acc * colmask


def _layer_norm_rows(x, scale, bias, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _quant_rows(x):
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-9) / 127.0
    return jnp.round(x / scale).astype(jnp.int8), scale


def _quant_static(x, inv):
    """Static-scale quantization: one broadcast multiply + clip instead of
    the per-row lane reduce + divide of :func:`_quant_rows` (the reduce is
    ~0.9 ms/block of VPU time at stage 3, BENCH_NOTES.md round 3). ``inv``
    is the calibrated per-channel 127/amax row vector; the matching
    per-channel scales are folded into the weight quantization
    (:func:`quantize_block_weights_folded`), so dequantization needs only
    the weight scale."""
    return jnp.round(jnp.clip(x * inv, -127.0, 127.0)).astype(jnp.int8)


def _kernel_bf16(x_ref, dwk_ref, dwb_ref, lns_ref, lnb_ref, w1_ref, b1_ref,
                 w2_ref, b2_ref, g_ref, out_ref, *, h, w, eps, tap_dtype):
    # bt images per grid step: dwconv runs per image (2-D rolls), then
    # the planes are concatenated along rows so the MLP GEMMs see
    # M = bt*HW (lifts MXU utilization at small plane sizes)
    bt = x_ref.shape[0]
    x32s = [x_ref[i].astype(jnp.float32) for i in range(bt)]
    ds = [_dwconv_flat(x32, dwk_ref[:], dwb_ref[:], h, w,
                       tap_dtype=tap_dtype) for x32 in x32s]
    d = ds[0] if bt == 1 else jnp.concatenate(ds, axis=0)
    n = _layer_norm_rows(d, lns_ref[:], lnb_ref[:], eps)
    hid = jnp.dot(n.astype(jnp.bfloat16), w1_ref[:],
                  preferred_element_type=jnp.float32) + b1_ref[:]
    a = jax.nn.gelu(hid, approximate=True)
    y = jnp.dot(a.astype(jnp.bfloat16), w2_ref[:],
                preferred_element_type=jnp.float32) + b2_ref[:]
    hw = h * w
    for i in range(bt):
        out_ref[i] = (x32s[i] + y[i * hw:(i + 1) * hw] * g_ref[:]) \
            .astype(out_ref.dtype)


def _kernel_int8(x_ref, dwk_ref, dwb_ref, lns_ref, lnb_ref, w1_ref, s1_ref,
                 b1_ref, w2_ref, s2_ref, b2_ref, g_ref, out_ref,
                 *, h, w, eps, tap_dtype):
    bt = x_ref.shape[0]
    x32s = [x_ref[i].astype(jnp.float32) for i in range(bt)]
    ds = [_dwconv_flat(x32, dwk_ref[:], dwb_ref[:], h, w,
                       tap_dtype=tap_dtype) for x32 in x32s]
    d = ds[0] if bt == 1 else jnp.concatenate(ds, axis=0)
    n = _layer_norm_rows(d, lns_ref[:], lnb_ref[:], eps)
    nq, nsc = _quant_rows(n)
    hid = jnp.dot(nq, w1_ref[:], preferred_element_type=jnp.int32)
    hid = hid.astype(jnp.float32) * nsc * s1_ref[:] + b1_ref[:]
    a = jax.nn.gelu(hid, approximate=True)
    aq, asc = _quant_rows(a)
    y = jnp.dot(aq, w2_ref[:], preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * asc * s2_ref[:] + b2_ref[:]
    hw = h * w
    for i in range(bt):
        out_ref[i] = (x32s[i] + y[i * hw:(i + 1) * hw] * g_ref[:]) \
            .astype(out_ref.dtype)


def _kernel_int8_static(x_ref, dwk_ref, dwb_ref, lns_ref, lnb_ref, w1_ref,
                        s1_ref, b1_ref, i1_ref, w2_ref, s2_ref, b2_ref,
                        i2_ref, g_ref, out_ref, *, h, w, eps, tap_dtype):
    bt = x_ref.shape[0]
    x32s = [x_ref[i].astype(jnp.float32) for i in range(bt)]
    ds = [_dwconv_flat(x32, dwk_ref[:], dwb_ref[:], h, w,
                       tap_dtype=tap_dtype) for x32 in x32s]
    d = ds[0] if bt == 1 else jnp.concatenate(ds, axis=0)
    n = _layer_norm_rows(d, lns_ref[:], lnb_ref[:], eps)
    nq = _quant_static(n, i1_ref[:])
    hid = jnp.dot(nq, w1_ref[:], preferred_element_type=jnp.int32)
    hid = hid.astype(jnp.float32) * s1_ref[:] + b1_ref[:]
    a = jax.nn.gelu(hid, approximate=True)
    aq = _quant_static(a, i2_ref[:])
    y = jnp.dot(aq, w2_ref[:], preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * s2_ref[:] + b2_ref[:]
    hw = h * w
    for i in range(bt):
        out_ref[i] = (x32s[i] + y[i * hw:(i + 1) * hw] * g_ref[:]) \
            .astype(out_ref.dtype)


def _kernel_bf16_pad(x_ref, dwk_ref, dwb_ref, lns_ref, lnb_ref, w1_ref,
                     b1_ref, w2_ref, b2_ref, g_ref, cm_ref, out_ref,
                     *, h, w, wp, eps, tap_dtype, pad_in, unpad_out):
    hwp = h * wp
    padr = PAD * wp
    xp = _load_padded(x_ref, h, w, wp, pad_in)
    d = _dwconv_pad(xp, dwk_ref[0], dwb_ref[:], cm_ref[:], h, wp,
                    tap_dtype=tap_dtype)
    n = _layer_norm_rows(d, lns_ref[:], lnb_ref[:], eps)
    hid = jnp.dot(n.astype(jnp.bfloat16), w1_ref[:],
                  preferred_element_type=jnp.float32) + b1_ref[:]
    a = jax.nn.gelu(hid, approximate=True)
    y = jnp.dot(a.astype(jnp.bfloat16), w2_ref[:],
                preferred_element_type=jnp.float32) + b2_ref[:]
    res = (xp[padr:padr + hwp].astype(jnp.float32)
           + y * g_ref[:]) * cm_ref[:]
    _store_padded(out_ref, res, h, w, wp, unpad_out)


def _kernel_int8_pad(x_ref, dwk_ref, dwb_ref, lns_ref, lnb_ref, w1_ref,
                     s1_ref, b1_ref, w2_ref, s2_ref, b2_ref, g_ref,
                     cm_ref, out_ref, *, h, w, wp, eps, tap_dtype, pad_in,
                     unpad_out):
    hwp = h * wp
    padr = PAD * wp
    xp = _load_padded(x_ref, h, w, wp, pad_in)
    d = _dwconv_pad(xp, dwk_ref[0], dwb_ref[:], cm_ref[:], h, wp,
                    tap_dtype=tap_dtype)
    n = _layer_norm_rows(d, lns_ref[:], lnb_ref[:], eps)
    nq, nsc = _quant_rows(n)
    hid = jnp.dot(nq, w1_ref[:], preferred_element_type=jnp.int32)
    hid = hid.astype(jnp.float32) * nsc * s1_ref[:] + b1_ref[:]
    a = jax.nn.gelu(hid, approximate=True)
    aq, asc = _quant_rows(a)
    y = jnp.dot(aq, w2_ref[:], preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * asc * s2_ref[:] + b2_ref[:]
    res = (xp[padr:padr + hwp].astype(jnp.float32)
           + y * g_ref[:]) * cm_ref[:]
    _store_padded(out_ref, res, h, w, wp, unpad_out)


def _kernel_int8_static_pad(x_ref, dwk_ref, dwb_ref, lns_ref, lnb_ref,
                            w1_ref, s1_ref, b1_ref, i1_ref, w2_ref, s2_ref,
                            b2_ref, i2_ref, g_ref, cm_ref, out_ref,
                            *, h, w, wp, eps, tap_dtype, pad_in,
                            unpad_out):
    hwp = h * wp
    padr = PAD * wp
    xp = _load_padded(x_ref, h, w, wp, pad_in)
    d = _dwconv_pad(xp, dwk_ref[0], dwb_ref[:], cm_ref[:], h, wp,
                    tap_dtype=tap_dtype)
    n = _layer_norm_rows(d, lns_ref[:], lnb_ref[:], eps)
    nq = _quant_static(n, i1_ref[:])
    hid = jnp.dot(nq, w1_ref[:], preferred_element_type=jnp.int32)
    hid = hid.astype(jnp.float32) * s1_ref[:] + b1_ref[:]
    a = jax.nn.gelu(hid, approximate=True)
    aq = _quant_static(a, i2_ref[:])
    y = jnp.dot(aq, w2_ref[:], preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * s2_ref[:] + b2_ref[:]
    res = (xp[padr:padr + hwp].astype(jnp.float32)
           + y * g_ref[:]) * cm_ref[:]
    _store_padded(out_ref, res, h, w, wp, unpad_out)


def fused_block_apply_padded(xp, h, w, dw_kernel, dw_bias, ln_scale,
                             ln_bias, w1, b1, w2, b2, gamma, *,
                             int8: bool = False, act_scales=None,
                             dw_bf16: bool = False,
                             pad_in: bool = False,
                             unpad_out: bool = False,
                             eps: float = 1e-6,
                             interpret: bool = False):
    """Whole ConvNeXt block on zero-padded planes (see pad_planes).

    Same math as :func:`fused_block_apply` (bit-identical dwconv — the
    padding only replaces rolls+masks with aligned slices), measured
    ~12% faster at stage-1 geometry and ~4% at stage 3. ``xp`` is
    [B, (H+6)*WP, C]; returns the same layout with the zero-pad
    invariant restored for chaining. ``act_scales``: optional
    (amax_ln [C], amax_gelu [4C]) calibrated activation maxima — switches
    the int8 path to static quantization (see :func:`_quant_static`).
    ``dw_bf16``: run the 49 dwconv tap FMAs in bf16 (see
    :func:`_dwconv_pad`) — roughly halves the kernel's VPU tap cost.
    ``pad_in``: ``xp`` is the COMPACT [B, H, W, C] plane and the padded
    layout is built in VMEM (:func:`_load_padded`) — use on the FIRST
    block of a stage in place of a standalone :func:`pad_planes`.
    ``unpad_out``: return the compact [B, H, W, C] plane
    (:func:`_store_padded`) — use on the LAST block of a stage in place
    of :func:`unpad_planes`.
    """
    wp = _wp_for(w)
    if pad_in:
        b, hh, ww, c = xp.shape
        assert (hh, ww) == (h, w), (xp.shape, h, w)
    else:
        b, tot, c = xp.shape
        assert tot == (h + 2 * PAD) * wp, (tot, h, w, wp)
    tot = (h + 2 * PAD) * wp
    tap_dtype = jnp.bfloat16 if dw_bf16 else jnp.float32
    hdim = w1.shape[1]
    hwp = h * wp
    dwk = jnp.asarray(dw_kernel, jnp.float32).reshape(1, K * K, c)
    cm = plane_colmask(h, w, wp)
    vec = lambda v, n: jnp.asarray(v, jnp.float32).reshape(1, n)

    space = pl.ANY if interpret else pltpu.VMEM
    rep = lambda i: (0, 0)
    if pad_in:
        x_spec = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                              memory_space=space)
    else:
        x_spec = pl.BlockSpec((1, tot, c), lambda i: (i, 0, 0),
                              memory_space=space)
    common = [
        x_spec,
        pl.BlockSpec((1, K * K, c), lambda i: (0, 0, 0),
                     memory_space=space),
    ]
    marshal = dict(pad_in=pad_in, unpad_out=unpad_out, w=w)
    args = [xp, dwk, vec(dw_bias, c), vec(ln_scale, c), vec(ln_bias, c)]
    if int8 and act_scales is not None:
        w1q, s1, i1 = quantize_block_weights_folded(w1, act_scales[0])
        w2q, s2, i2 = quantize_block_weights_folded(w2, act_scales[1])
        kern = functools.partial(_kernel_int8_static_pad, h=h, wp=wp,
                                 eps=eps, tap_dtype=tap_dtype, **marshal)
        in_specs = common + [
            pl.BlockSpec(s, rep, memory_space=space)
            for s in [(1, c), (1, c), (1, c), (c, hdim), (1, hdim),
                      (1, hdim), (1, c), (hdim, c), (1, c), (1, c),
                      (1, hdim), (1, c)]] + [
            pl.BlockSpec((hwp, 1), rep, memory_space=space)]
        args += [w1q, s1, vec(b1, hdim), i1, w2q, s2, vec(b2, c), i2,
                 vec(gamma, c), cm]
    elif int8:
        w1q, s1 = quantize_block_weights(w1)
        w2q, s2 = quantize_block_weights(w2)
        kern = functools.partial(_kernel_int8_pad, h=h, wp=wp, eps=eps,
                                 tap_dtype=tap_dtype, **marshal)
        in_specs = common + [
            pl.BlockSpec(s, rep, memory_space=space)
            for s in [(1, c), (1, c), (1, c), (c, hdim), (1, hdim),
                      (1, hdim), (hdim, c), (1, c), (1, c), (1, c)]] + [
            pl.BlockSpec((hwp, 1), rep, memory_space=space)]
        args += [w1q, s1, vec(b1, hdim), w2q, s2, vec(b2, c),
                 vec(gamma, c), cm]
    else:
        kern = functools.partial(_kernel_bf16_pad, h=h, wp=wp, eps=eps,
                                 tap_dtype=tap_dtype, **marshal)
        in_specs = common + [
            pl.BlockSpec(s, rep, memory_space=space)
            for s in [(1, c), (1, c), (1, c), (c, hdim), (1, hdim),
                      (hdim, c), (1, c), (1, c)]] + [
            pl.BlockSpec((hwp, 1), rep, memory_space=space)]
        args += [jnp.asarray(w1, jnp.bfloat16), vec(b1, hdim),
                 jnp.asarray(w2, jnp.bfloat16), vec(b2, c),
                 vec(gamma, c), cm]

    if unpad_out:
        out_specs = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                                 memory_space=space)
        out_shape = jax.ShapeDtypeStruct((b, h, w, c), xp.dtype)
    else:
        out_specs = pl.BlockSpec((1, tot, c), lambda i: (i, 0, 0),
                                 memory_space=space)
        out_shape = jax.ShapeDtypeStruct((b, tot, c), xp.dtype)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*args)


def quantize_block_weights(kernel):
    """[C, H] float -> (int8 [C, H], f32 scale [1, H]) symmetric
    per-output-channel."""
    k = jnp.asarray(kernel, jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=0, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_block_weights_folded(kernel, act_amax):
    """Weight quantization for the STATIC activation-scale mode.

    The calibrated per-input-channel activation scale ``amax_k/127`` is
    folded into the weight before per-output-channel quantization, so
    ``acc * wscale`` alone dequantizes the int8 GEMM:

        sum_k x_k w_kn  ~=  wscale_n * sum_k round(x_k*127/amax_k) q_kn

    Returns (int8 [C, H], f32 wscale [1, H], f32 inv [1, C] = 127/amax).
    """
    amax = jnp.maximum(jnp.asarray(act_amax, jnp.float32).reshape(-1),
                       1e-9)
    k = jnp.asarray(kernel, jnp.float32) * (amax / 127.0)[:, None]
    q, scale = quantize_block_weights(k)
    return q, scale, (127.0 / amax).reshape(1, -1)


def fused_block_apply(x, h, w, dw_kernel, dw_bias, ln_scale, ln_bias,
                      w1, b1, w2, b2, gamma, *, int8: bool = False,
                      act_scales=None, dw_bf16: bool = False,
                      batch_tile: int = 1, eps: float = 1e-6,
                      interpret: bool = False):
    """Whole ConvNeXt block on flattened planes.

    Args:
      x: [B, H*W, C] (bf16/f32) — the block input (residual source).
      h, w: static spatial dims with h*w == x.shape[1].
      dw_kernel: [7, 7, 1, C] depthwise weights (flax layout).
      w1: [C, 4C]; w2: [4C, C] — pass float weights; quantized at trace
        time when ``int8=True``.
      Other params: [C]/[4C] vectors.

    Returns [B, H*W, C] in x.dtype.
    """
    b, hw, c = x.shape
    assert hw == h * w, (hw, h, w)
    bt = batch_tile
    while b % bt:
        bt -= 1
    hdim = w1.shape[1]
    dwk = jnp.asarray(dw_kernel, jnp.float32).reshape(K * K, 1, c)

    def rep(i):
        return (0, 0)

    common_in = [
        pl.BlockSpec((bt, hw, c), lambda i: (i, 0, 0),
                     memory_space=pl.ANY if interpret else pltpu.VMEM),
    ]
    space = pl.ANY if interpret else pltpu.VMEM
    small = [
        pl.BlockSpec((K * K, 1, c), lambda i: (0, 0, 0),
                     memory_space=space),           # dw kernel
        pl.BlockSpec((1, c), rep, memory_space=space),   # dw bias
        pl.BlockSpec((1, c), rep, memory_space=space),   # ln scale
        pl.BlockSpec((1, c), rep, memory_space=space),   # ln bias
    ]

    vec = lambda v, n: jnp.asarray(v, jnp.float32).reshape(1, n)
    args = [x, dwk, vec(dw_bias, c), vec(ln_scale, c), vec(ln_bias, c)]

    if int8 and act_scales is not None:
        w1q, s1, i1 = quantize_block_weights_folded(w1, act_scales[0])
        w2q, s2, i2 = quantize_block_weights_folded(w2, act_scales[1])
        kern = functools.partial(
            _kernel_int8_static, h=h, w=w, eps=eps,
            tap_dtype=jnp.bfloat16 if dw_bf16 else jnp.float32)
        in_specs = common_in + small + [
            pl.BlockSpec((c, hdim), rep, memory_space=space),
            pl.BlockSpec((1, hdim), rep, memory_space=space),
            pl.BlockSpec((1, hdim), rep, memory_space=space),
            pl.BlockSpec((1, c), rep, memory_space=space),
            pl.BlockSpec((hdim, c), rep, memory_space=space),
            pl.BlockSpec((1, c), rep, memory_space=space),
            pl.BlockSpec((1, c), rep, memory_space=space),
            pl.BlockSpec((1, hdim), rep, memory_space=space),
            pl.BlockSpec((1, c), rep, memory_space=space),
        ]
        args += [w1q, s1, vec(b1, hdim), i1, w2q, s2, vec(b2, c), i2,
                 vec(gamma, c)]
    elif int8:
        w1q, s1 = quantize_block_weights(w1)
        w2q, s2 = quantize_block_weights(w2)
        kern = functools.partial(
            _kernel_int8, h=h, w=w, eps=eps,
            tap_dtype=jnp.bfloat16 if dw_bf16 else jnp.float32)
        in_specs = common_in + small + [
            pl.BlockSpec((c, hdim), rep, memory_space=space),
            pl.BlockSpec((1, hdim), rep, memory_space=space),
            pl.BlockSpec((1, hdim), rep, memory_space=space),
            pl.BlockSpec((hdim, c), rep, memory_space=space),
            pl.BlockSpec((1, c), rep, memory_space=space),
            pl.BlockSpec((1, c), rep, memory_space=space),
            pl.BlockSpec((1, c), rep, memory_space=space),
        ]
        args += [w1q, s1, vec(b1, hdim), w2q, s2, vec(b2, c),
                 vec(gamma, c)]
    else:
        kern = functools.partial(
            _kernel_bf16, h=h, w=w, eps=eps,
            tap_dtype=jnp.bfloat16 if dw_bf16 else jnp.float32)
        in_specs = common_in + small + [
            pl.BlockSpec((c, hdim), rep, memory_space=space),
            pl.BlockSpec((1, hdim), rep, memory_space=space),
            pl.BlockSpec((hdim, c), rep, memory_space=space),
            pl.BlockSpec((1, c), rep, memory_space=space),
            pl.BlockSpec((1, c), rep, memory_space=space),
        ]
        args += [jnp.asarray(w1, jnp.bfloat16), vec(b1, hdim),
                 jnp.asarray(w2, jnp.bfloat16), vec(b2, c), vec(gamma, c)]

    return pl.pallas_call(
        kern,
        grid=(b // bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, hw, c), lambda i: (i, 0, 0),
                               memory_space=space),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# Differentiable wrapper: whole-block Pallas forward, XLA-recompute backward
# ---------------------------------------------------------------------------
def _block_body_xla(x4, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2,
                    b2, gamma, eps):
    """XLA reference of the whole block on NHWC (tanh-GELU + the same
    bf16 GEMM casts as the kernel) — used for the backward recompute and
    the CPU fallback. Nothing wider than [B,H,W,C] is saved: the VJP
    recomputes the dwconv output and the 4C intermediate (remat-style)."""
    x32 = x4.astype(jnp.float32)
    d = jax.lax.conv_general_dilated(
        x32, jnp.asarray(dw_kernel, jnp.float32),
        window_strides=(1, 1), padding=((PAD, PAD), (PAD, PAD)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x4.shape[-1])
    d = d + jnp.asarray(dw_bias, jnp.float32)
    mu = jnp.mean(d, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(d - mu), axis=-1, keepdims=True)
    n = (d - mu) * jax.lax.rsqrt(var + eps)
    n = n * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    h = n.astype(jnp.bfloat16) @ w1.astype(jnp.bfloat16)
    h = h.astype(jnp.float32) + b1.astype(jnp.float32)
    a = jax.nn.gelu(h, approximate=True)
    y = a.astype(jnp.bfloat16) @ w2.astype(jnp.bfloat16)
    y = y.astype(jnp.float32) + b2.astype(jnp.float32)
    return (x32 + y * gamma.astype(jnp.float32)).astype(x4.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_block_ad(x4, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2,
                   b2, gamma, eps=1e-6, use_pallas=True):
    """Differentiable WHOLE ConvNeXt block on NHWC input: one Pallas
    kernel forward (dwconv + LN + MLP + layer-scale + residual — the
    dwconv output and 4C intermediate never touch HBM), backward by
    recomputation through the XLA body. Training-capable counterpart of
    :func:`fused_block_apply` (bf16 mode; quantization is serving-only).
    """
    if not use_pallas:
        return _block_body_xla(x4, dw_kernel, dw_bias, ln_scale, ln_bias,
                               w1, b1, w2, b2, gamma, eps)
    b, h, w, c = x4.shape
    out = fused_block_apply(
        x4.reshape(b, h * w, c), h, w, dw_kernel, dw_bias, ln_scale,
        ln_bias, w1, b1, w2, b2, gamma, int8=False, eps=eps)
    return out.reshape(b, h, w, c)


def _block_ad_fwd(x4, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2,
                  b2, gamma, eps, use_pallas):
    out = fused_block_ad(x4, dw_kernel, dw_bias, ln_scale, ln_bias, w1,
                         b1, w2, b2, gamma, eps, use_pallas)
    return out, (x4, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2,
                 b2, gamma)


def _block_ad_bwd(eps, use_pallas, res, g):
    (x4, dw_kernel, dw_bias, ln_scale, ln_bias, w1, b1, w2, b2,
     gamma) = res
    _, vjp_fn = jax.vjp(
        lambda *a: _block_body_xla(*a, eps), x4, dw_kernel, dw_bias,
        ln_scale, ln_bias, w1, b1, w2, b2, gamma)
    return vjp_fn(g)


fused_block_ad.defvjp(_block_ad_fwd, _block_ad_bwd)
