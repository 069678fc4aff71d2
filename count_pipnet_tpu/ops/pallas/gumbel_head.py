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

__all__ = ["gumbel_hard_counts", "gumbel_hard_counts_reference",
           "fused_block_gumbel_counts"]

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
    # f32 cast happens per-tile in VMEM on load. On-chip A/B
    # (scripts/bench_serving_glue.py): 92.18 vs 93.47 ms/step end-to-end,
    # counts parity 0.997 — ragged is the default. GUMBEL_HEAD_PADDED=1
    # restores the padded/f32 host-side prep (pre-round-5 behavior) in
    # case a toolchain change breaks ragged tiles on real TPU.
    padded = os.environ.get("GUMBEL_HEAD_PADDED", "0") == "1"
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


# ---------------------------------------------------------------------------
# Fused final-block + gumbel-hard head: the last ConvNeXt block's output
# plane never touches HBM at all.
# ---------------------------------------------------------------------------
#
# In the serving graph the final stage-4 block's output feeds ONLY the
# gumbel-hard counting head (bench.py / models/serving.py: no add-on conv
# at num_features=0). Writing the [B, 676, 768] bf16 plane and re-reading
# it in the head kernel costs two HBM passes (~0.6 ms each at batch 256)
# plus the relayout/pad glue the round-5 device trace priced at
# 2.13 ms/step. This kernel runs the whole block body (dwconv + LN +
# int8/bf16 MLP + layer-scale + residual — ops/pallas/fused_block.py
# semantics, same helpers) and immediately histograms the noisy argmax
# per patch row, emitting only the [B, P] counts.

_HIST_CHUNK = 128


def _hist_from_res(res, hw_n, c, chunk, draw_noise, noise=None):
    """Gumbel-hard histogram of ``res`` [hw, c] -> [1, c], accumulated in
    row chunks to bound VMEM (the one-hot never exceeds [chunk, c]).
    ``draw_noise(rows)``: callback returning a [rows, c] Gumbel slab."""
    acc = jnp.zeros((1, c), jnp.float32)
    for s in range(0, hw_n, chunk):
        rows = min(chunk, hw_n - s)
        gum = noise[s:s + rows] if noise is not None else draw_noise(rows)
        noisy = res[s:s + rows] + gum
        winner = jnp.argmax(noisy, axis=1)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (rows, c), 1)
                  == winner[:, None]).astype(jnp.float32)
        acc = acc + jnp.sum(onehot, axis=0, keepdims=True)
    return acc


def _draw_gumbel(rows, c):
    """[rows, c] Gumbel(0,1) slab from the on-core PRNG (seeded by the
    caller). Same bit recipe as :func:`_kernel`."""
    bits = pltpu.prng_random_bits((rows, c))
    top = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32)
    u = top.astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-12
    return -jnp.log(-jnp.log(u))


def _block_head_body(x32, refs, h, w, eps, tap_dtype, int8):
    """Shared block body: dwconv7 + LN + MLP (+ layer-scale + residual).
    ``refs``: dict of weight refs. Returns the residual output [hw, c]."""
    from .fused_block import (
        _dwconv_flat, _layer_norm_rows, _quant_static,
    )
    d = _dwconv_flat(x32, refs["dwk"][:], refs["dwb"][:], h, w,
                     tap_dtype=tap_dtype)
    n = _layer_norm_rows(d, refs["lns"][:], refs["lnb"][:], eps)
    if int8:
        nq = _quant_static(n, refs["i1"][:])
        hid = jnp.dot(nq, refs["w1"][:], preferred_element_type=jnp.int32)
        hid = hid.astype(jnp.float32) * refs["s1"][:] + refs["b1"][:]
        a = jax.nn.gelu(hid, approximate=True)
        aq = _quant_static(a, refs["i2"][:])
        y = jnp.dot(aq, refs["w2"][:], preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * refs["s2"][:] + refs["b2"][:]
    else:
        hid = jnp.dot(n.astype(jnp.bfloat16), refs["w1"][:],
                      preferred_element_type=jnp.float32) + refs["b1"][:]
        a = jax.nn.gelu(hid, approximate=True)
        y = jnp.dot(a.astype(jnp.bfloat16), refs["w2"][:],
                    preferred_element_type=jnp.float32) + refs["b2"][:]
    return x32 + y * refs["g"][:]


def _mk_block_head_kernel(names, h, w, eps, tap_dtype, int8, chunk,
                          injected):
    """Build the fused kernel function for the given weight-ref names."""
    hw_n = h * w

    def kernel(*args):
        if injected:
            x_ref, noise_ref = args[0], args[1]
            refs = dict(zip(names, args[2:-1]))
            out_ref = args[-1]
        else:
            seed_ref, x_ref = args[0], args[1]
            refs = dict(zip(names, args[2:-1]))
            out_ref = args[-1]
            i = pl.program_id(0)
            pltpu.prng_seed(seed_ref[0] + i)
        x32 = x_ref[0].astype(jnp.float32)
        res = _block_head_body(x32, refs, h, w, eps, tap_dtype, int8)
        c = res.shape[-1]
        noise = (noise_ref[0].astype(jnp.float32) if injected else None)
        acc = _hist_from_res(res, hw_n, c, chunk,
                             lambda rows: _draw_gumbel(rows, c),
                             noise=noise)
        out_ref[0, 0] = acc[0]

    return kernel


def fused_block_gumbel_counts(x, h, w, dw_kernel, dw_bias, ln_scale,
                              ln_bias, w1, b1, w2, b2, gamma, seed, *,
                              int8: bool = False, act_scales=None,
                              eps: float = 1e-6,
                              chunk: int = _HIST_CHUNK,
                              noise=None, interpret: bool = False):
    """Final ConvNeXt block + gumbel-hard counting head in ONE kernel.

    Args:
      x: [B, H*W, C] block input (the stage-4 flattened plane).
      h, w: static spatial dims (h*w == x.shape[1]).
      block params: as :func:`fused_block.fused_block_apply`.
      seed: int32 scalar for the on-core PRNG (ignored when ``noise``
        is given).
      int8 / act_scales: static-scale int8 MLP mode (serving path);
        ``int8=True`` requires ``act_scales`` (the dynamic per-row
        variant is not carried here — serving uses calibrated scales).
      noise: optional [B, H*W, C] pre-drawn Gumbel noise (CPU tests /
        bench parity check — the on-core PRNG has no CPU lowering).

    Returns [B, C] float32 gumbel-hard prototype counts — the block's
    output plane itself never leaves VMEM.
    """
    from .fused_block import K, quantize_block_weights_folded

    b, hw_n, c = x.shape
    assert hw_n == h * w, (hw_n, h, w)
    if int8 and act_scales is None:
        raise ValueError("fused_block_gumbel_counts int8 mode requires "
                         "calibrated act_scales")
    hdim = w1.shape[1]
    dwk = jnp.asarray(dw_kernel, jnp.float32).reshape(K * K, 1, c)
    vec = lambda v, n: jnp.asarray(v, jnp.float32).reshape(1, n)
    space = pl.ANY if interpret else pltpu.VMEM
    rep = lambda i: (0, 0)

    names = ["dwk", "dwb", "lns", "lnb"]
    wargs = [dwk, vec(dw_bias, c), vec(ln_scale, c), vec(ln_bias, c)]
    wspecs = [
        pl.BlockSpec((K * K, 1, c), lambda i: (0, 0, 0),
                     memory_space=space),
        pl.BlockSpec((1, c), rep, memory_space=space),
        pl.BlockSpec((1, c), rep, memory_space=space),
        pl.BlockSpec((1, c), rep, memory_space=space),
    ]
    if int8:
        w1q, s1, i1 = quantize_block_weights_folded(w1, act_scales[0])
        w2q, s2, i2 = quantize_block_weights_folded(w2, act_scales[1])
        names += ["w1", "s1", "b1", "i1", "w2", "s2", "b2", "i2", "g"]
        wargs += [w1q, s1, vec(b1, hdim), i1, w2q, s2, vec(b2, c), i2,
                  vec(gamma, c)]
        wspecs += [pl.BlockSpec(s, rep, memory_space=space)
                   for s in [(c, hdim), (1, hdim), (1, hdim), (1, c),
                             (hdim, c), (1, c), (1, c), (1, hdim),
                             (1, c)]]
    else:
        names += ["w1", "b1", "w2", "b2", "g"]
        wargs += [jnp.asarray(w1, jnp.bfloat16), vec(b1, hdim),
                  jnp.asarray(w2, jnp.bfloat16), vec(b2, c), vec(gamma, c)]
        wspecs += [pl.BlockSpec(s, rep, memory_space=space)
                   for s in [(c, hdim), (1, hdim), (hdim, c), (1, c),
                             (1, c)]]

    x_spec = pl.BlockSpec((1, hw_n, c), lambda i: (i, 0, 0),
                          memory_space=space)
    kern = _mk_block_head_kernel(names, h, w, eps,
                                 jnp.float32, int8, chunk,
                                 injected=noise is not None)
    if noise is not None:
        in_specs = [x_spec, x_spec] + wspecs
        args = [x, noise.reshape(b, hw_n, c)] + wargs
    else:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), x_spec] + wspecs
        args = [jnp.asarray([seed], jnp.int32), x] + wargs

    # Output carried as [B, 1, C] so the per-image block (1, 1, C) has
    # its last two dims equal to the array's — Mosaic requires the last
    # two block dims be (8, 128)-divisible or full-extent, and a
    # (1, C) block over a [B, C] array violates that on real TPU.
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                               memory_space=space),
        out_shape=jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*args)
    return out[:, 0]
