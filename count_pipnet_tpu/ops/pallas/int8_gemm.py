"""Pallas TPU kernel: row-tiled int8 GEMM with in-kernel activation quant.

y[M, N] = dequant(quant_rows(x[M, K]) @ wq[K, N]) * wscale + bias

Weights are quantized once at trace time (symmetric per-output-channel);
activations are quantized per row inside the kernel (abs-max / 127), so
the bf16 activations never round-trip through an HBM int8 copy. Measured
(scripts/bench_int8_gemm.py, batch-256 ConvNeXt shapes): 105 TF/s at
K=384, 207 TF/s at K=1536/N=768 — vs the 126 TF/s bf16 MXU ceiling.

Used by models/quantized.fused_block_convnext_apply for the stage-3 ->
stage-4 downsample projection (K=4*384 after 2x2 im2col), where XLA's
bf16 conv runs at 62 TF/s.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["int8_quant_gemm", "quantize_gemm_weights"]

ROW_TILE = 512


def quantize_gemm_weights(w):
    """[K, N] float -> (int8 [K, N], f32 [1, N]) symmetric per-column."""
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _kernel(x_ref, wq_ref, ws_ref, b_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    ascale = jnp.maximum(amax, 1e-9) / 127.0
    xq = jnp.round(x / ascale).astype(jnp.int8)
    acc = jnp.dot(xq, wq_ref[:], preferred_element_type=jnp.int32)
    out_ref[:] = (acc.astype(jnp.float32) * ascale * ws_ref[:]
                  + b_ref[:]).astype(out_ref.dtype)


def int8_quant_gemm(x, w, bias=None, *, out_dtype=None,
                    row_tile: int = ROW_TILE, interpret: bool = False):
    """x [M, K] (any float) @ w [K, N] (float, quantized at trace time).

    Returns [M, N] in ``out_dtype`` (default x.dtype). M is padded up to
    a multiple of ``row_tile`` internally.
    """
    m, k = x.shape
    n = w.shape[1]
    out_dtype = out_dtype or x.dtype
    wq, ws = quantize_gemm_weights(w)
    b = (jnp.zeros((1, n), jnp.float32) if bias is None
         else jnp.asarray(bias, jnp.float32).reshape(1, n))

    tiles = max(1, -(-m // row_tile))
    mp = tiles * row_tile
    xf = x if mp == m else jnp.pad(x, ((0, mp - m), (0, 0)))

    space = pl.ANY if interpret else pltpu.VMEM
    rep = lambda i: (0, 0)
    out = pl.pallas_call(
        _kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((row_tile, k), lambda i: (i, 0),
                         memory_space=space),
            pl.BlockSpec((k, n), rep, memory_space=space),
            pl.BlockSpec((1, n), rep, memory_space=space),
            pl.BlockSpec((1, n), rep, memory_space=space),
        ],
        out_specs=pl.BlockSpec((row_tile, n), lambda i: (i, 0),
                               memory_space=space),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(xf, wq, ws, b)
    return out[:m]
