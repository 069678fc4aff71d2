"""Hand-written Pallas backward for the fused ConvNeXt block MLP.

Round-2's ``--fused_blocks`` training path used a remat-style VJP: Pallas
forward, backward by re-running the XLA body under ``jax.vjp``
(fused_mlp._fused_ad_bwd).  That backward materializes every 4C-wide
intermediate (n, h, a, da, dh) in HBM — at stage 3 geometry and training
batch 64 two-view that is ~1.5 GB of HBM traffic per block backward.

This kernel runs the whole backward in ONE pallas_call per block:

  recompute (VPU+MXU):  n = LN(x);  h = n@w1 + b1;  a = gelu_tanh(h)
  backward   (MXU):     dy = g*gamma
                        da = dy @ w2^T          dw2r += a^T @ g
                        dh = da * gelu'(h)      sg   += sum(g)
                        dn = dh @ w1^T          dw1  += n^T @ dh
                                                db1  += sum(dh)
  LN backward (VPU):    dls += sum(dn * xhat);  dlb += sum(dn)
                        dx = (s/sigma) * (dnh - mean(dnh)
                             - xhat * mean(dnh * xhat)),  dnh = dn * ls

The 4C-wide tensors live only in VMEM; parameter gradients accumulate
across row tiles into constant-index-map output blocks (sequential grid).
Transposed-operand GEMMs use dot_general dimension numbers directly so
w1/w2 are resident once (no transposed copies).

dw2/db2/dgamma are derived OUTSIDE the kernel from the raw accumulators
(gamma is per-channel, so it factors out of the row reductions):

    dw2    = gamma ⊙ dw2r            (dw2r = a^T @ g)
    db2    = gamma ⊙ sg              (sg = Σ_r g)
    dgamma = Σ_k dw2r[k,:]·w2[k,:] + b2 ⊙ sg

The last identity replaces the forward-output recompute ``y = a@w2 + b2``
(dgamma = Σ_r g ⊙ y) that an earlier version ran as a sixth R·C·4C GEMM
per tile — one-sixth of the kernel's MXU work spent only on dgamma.

Gradient semantics match fused_mlp._mlp_body exactly (same bf16 GEMM
casts, tanh-GELU); validated against jax.vjp of that body in
tests/test_fused_blocks.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_mlp_bwd"]

ROW_TILE = 256

_SQRT_2_OVER_PI = 0.7978845608028654
_KAPPA = 0.044715


def _gelu_tanh_and_grad(h):
    """tanh-approx GELU value and derivative (f32)."""
    h3 = h * h * h
    u = _SQRT_2_OVER_PI * (h + _KAPPA * h3)
    t = jnp.tanh(u)
    a = 0.5 * h * (1.0 + t)
    du = _SQRT_2_OVER_PI * (1.0 + 3.0 * _KAPPA * h * h)
    da = 0.5 * (1.0 + t) + 0.5 * h * (1.0 - t * t) * du
    return a, da


def _bwd_kernel(x_ref, g_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                gamma_ref, dx_ref, dw1_ref, db1_ref, dw2r_ref, sg_ref,
                dls_ref, dlb_ref, *, eps, c):
    i = pl.program_id(0)

    x = x_ref[:].astype(jnp.float32)                       # [R, C]
    g32 = g_ref[:].astype(jnp.float32)                     # [R, C]

    # ---- recompute forward to the GELU input -------------------------
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x - mu) * inv                                  # [R, C]
    n = xhat * lns_ref[:] + lnb_ref[:]
    nb = n.astype(jnp.bfloat16)
    h = jnp.dot(nb, w1_ref[:],
                preferred_element_type=jnp.float32) + b1_ref[:]
    a, dgelu = _gelu_tanh_and_grad(h)                      # [R, 4C]
    ab = a.astype(jnp.bfloat16)

    # ---- backward through the MLP ------------------------------------
    dy = g32 * gamma_ref[:]                                # [R, C]
    dyb = dy.astype(jnp.bfloat16)
    gb = g32.astype(jnp.bfloat16)
    # da = dy @ w2^T  (contract w2's output dim)
    da = jax.lax.dot_general(
        dyb, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # [R, 4C]
    dh = da * dgelu
    dhb = dh.astype(jnp.bfloat16)
    # dn = dh @ w1^T
    dn = jax.lax.dot_general(
        dhb, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # [R, C]

    # ---- parameter gradients (accumulated across row tiles) ----------
    # dw1 = n^T @ dh  -> contract the row dim of both operands
    dw1 = jax.lax.dot_general(
        nb, dhb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [C, 4C]
    # raw (gamma-free) accumulators; dw2/db2/dgamma derived by the caller
    dw2r = jax.lax.dot_general(
        ab, gb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [4C, C]
    db1 = jnp.sum(dh, axis=0, keepdims=True)               # [1, 4C]
    sg = jnp.sum(g32, axis=0, keepdims=True)               # [1, C]
    dls = jnp.sum(dn * xhat, axis=0, keepdims=True)        # [1, C]
    dlb = jnp.sum(dn, axis=0, keepdims=True)               # [1, C]

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = dw1
        db1_ref[:] = db1
        dw2r_ref[:] = dw2r
        sg_ref[:] = sg
        dls_ref[:] = dls
        dlb_ref[:] = dlb

    @pl.when(i > 0)
    def _():
        dw1_ref[:] += dw1
        db1_ref[:] += db1
        dw2r_ref[:] += dw2r
        sg_ref[:] += sg
        dls_ref[:] += dls
        dlb_ref[:] += dlb

    # ---- LayerNorm backward ------------------------------------------
    dnh = dn * lns_ref[:]
    m1 = jnp.mean(dnh, axis=1, keepdims=True)
    m2 = jnp.mean(dnh * xhat, axis=1, keepdims=True)
    dx = inv * (dnh - m1 - xhat * m2)
    dx_ref[:] = dx.astype(dx_ref.dtype)


def fused_mlp_bwd(x, g, ln_scale, ln_bias, w1, b1, w2, b2, gamma, *,
                  eps: float = 1e-6, row_tile=None,
                  interpret: bool = False):
    """Backward of ``residual + gamma * Dense2(gelu(Dense1(LN(x))))``
    w.r.t. every input except the residual (whose cotangent is ``g``).

    Args:
      x: forward input (the dwconv output), [..., C], any float dtype.
      g: cotangent of the block output, same shape.
      Params as in fused_ln_mlp_residual (b2 only affects the recomputed
      y used for dgamma).

    Returns (dx, dls, dlb, dw1, db1, dw2, db2, dgamma); dx matches x's
    shape/dtype, parameter grads are f32.
    """
    orig_shape = x.shape
    c = orig_shape[-1]
    hdim = w1.shape[1]
    if row_tile is None:
        # VMEM budget: resident bf16 weights 4*c*hdim bytes + f32 weight
        # -grad accumulators 8*c*hdim + ~5 live f32 [R, hdim]
        # intermediates. c=384 at R=256 measured 16.42 MB scoped — 432 KB
        # OVER the 16 MB limit at some grid sizes (the flagship pretrain
        # batch 96 two-view crashed; batch 64 two-view happened to fit).
        # Dropping the y-recompute GEMM freed one live [R, C] f32, so
        # c >= 384 runs R=192 (was 128).
        row_tile = ROW_TILE if c < 384 else 192
    rows = 1
    for d in orig_shape[:-1]:
        rows *= d
    xf = x.reshape(rows, c)
    gf = g.reshape(rows, c)

    num_tiles = pl.cdiv(rows, row_tile)
    pad = num_tiles * row_tile - rows
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
        gf = jnp.pad(gf, ((0, pad), (0, 0)))
        # padded g rows are zero => contribute nothing to any gradient

    kernel = functools.partial(_bwd_kernel, eps=eps, c=c)
    space = pl.ANY if interpret else pltpu.VMEM

    def rep(i):
        return (0, 0)

    out_shapes = (
        jax.ShapeDtypeStruct((num_tiles * row_tile, c), x.dtype),  # dx
        jax.ShapeDtypeStruct((c, hdim), jnp.float32),              # dw1
        jax.ShapeDtypeStruct((1, hdim), jnp.float32),              # db1
        jax.ShapeDtypeStruct((hdim, c), jnp.float32),              # dw2r
        jax.ShapeDtypeStruct((1, c), jnp.float32),                 # sg
        jax.ShapeDtypeStruct((1, c), jnp.float32),                 # dls
        jax.ShapeDtypeStruct((1, c), jnp.float32),                 # dlb
    )
    out_specs = (
        pl.BlockSpec((row_tile, c), lambda i: (i, 0), memory_space=space),
        pl.BlockSpec((c, hdim), rep, memory_space=space),
        pl.BlockSpec((1, hdim), rep, memory_space=space),
        pl.BlockSpec((hdim, c), rep, memory_space=space),
        pl.BlockSpec((1, c), rep, memory_space=space),
        pl.BlockSpec((1, c), rep, memory_space=space),
        pl.BlockSpec((1, c), rep, memory_space=space),
    )

    outs = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((row_tile, c), lambda i: (i, 0),
                         memory_space=space),
            pl.BlockSpec((row_tile, c), lambda i: (i, 0),
                         memory_space=space),
            pl.BlockSpec((1, c), rep, memory_space=space),
            pl.BlockSpec((1, c), rep, memory_space=space),
            pl.BlockSpec((c, hdim), rep, memory_space=space),
            pl.BlockSpec((1, hdim), rep, memory_space=space),
            pl.BlockSpec((hdim, c), rep, memory_space=space),
            pl.BlockSpec((1, c), rep, memory_space=space),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xf, gf,
      jnp.asarray(ln_scale, jnp.float32).reshape(1, c),
      jnp.asarray(ln_bias, jnp.float32).reshape(1, c),
      jnp.asarray(w1, jnp.bfloat16),
      jnp.asarray(b1, jnp.float32).reshape(1, hdim),
      jnp.asarray(w2, jnp.bfloat16),
      jnp.asarray(gamma, jnp.float32).reshape(1, c))

    dx, dw1, db1, dw2r, sg, dls, dlb = outs
    # gamma is per-output-channel, so it factors out of every row
    # reduction: derive the y-dependent gradients from the raw
    # accumulators instead of recomputing y = a@w2 + b2 in-kernel
    # (dgamma = Σ_r g⊙y  =  Σ_k dw2r[k,:]·w2[k,:] + b2⊙Σ_r g).
    gam = jnp.asarray(gamma, jnp.float32).reshape(1, c)
    dw2 = dw2r * gam
    db2 = (sg * gam).reshape(-1)
    dgamma = (jnp.sum(dw2r * jnp.asarray(w2, jnp.bfloat16)
                      .astype(jnp.float32), axis=0, keepdims=True)
              + jnp.asarray(b2, jnp.float32).reshape(1, c) * sg)
    return (dx[:rows].reshape(orig_shape), dls.reshape(-1),
            dlb.reshape(-1), dw1, db1.reshape(-1), dw2, db2,
            dgamma.reshape(-1))
