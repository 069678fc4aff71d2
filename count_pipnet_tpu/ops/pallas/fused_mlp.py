"""Pallas TPU kernel: fused ConvNeXt block MLP for inference.

A ConvNeXt block body after the depthwise conv is
    LayerNorm -> Dense(C -> 4C) -> GELU -> Dense(4C -> C)
      -> * layer_scale -> + residual
Executed op-by-op, the 4C-wide intermediate round-trips HBM: at batch 256
and 27x27x384 (stage 3) that is ~570 MB of traffic per block, ~9 blocks.
This kernel keeps everything for a row tile in VMEM: row-wise LayerNorm,
two MXU matmuls, exact GELU, layer-scale and the residual add — one HBM
read of x and one write of y per block.

VMEM budget per grid step (stage 4, C=768, ROW_TILE=128):
  x tile 0.4 MB (bf16) + w1/w2 9.4 MB (bf16) + h 1.5 MB (fp32) — ~12 MB.

Two entry points: :func:`fused_ln_mlp_residual` (raw kernel, serving fast
path) and :func:`fused_ln_mlp_residual_ad` (differentiable wrapper whose
custom VJP recomputes the block body with XLA ops — remat-style — so
``--fused_blocks`` training gets the Pallas forward AND exact gradients).
Used by models/quantized.fused_convnext_apply / serving fused_mlp=True /
models/convnext.py fused block bodies.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_ln_mlp_residual", "fused_ln_mlp_residual_ad"]

ROW_TILE = 256


def _kernel(x_ref, res_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
            b2_ref, gamma_ref, out_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)                      # [R, C]
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    xn = xn * lns_ref[:] + lnb_ref[:]

    h = jnp.dot(xn.astype(jnp.bfloat16), w1_ref[:],
                preferred_element_type=jnp.float32)       # [R, 4C]
    h = h + b1_ref[:]
    # tanh-approx GELU: the exact erf path has no Pallas TPU lowering;
    # max deviation ~3e-4 absolute — serving-grade.
    h = jax.nn.gelu(h, approximate=True)

    y = jnp.dot(h.astype(jnp.bfloat16), w2_ref[:],
                preferred_element_type=jnp.float32)       # [R, C]
    y = y + b2_ref[:]
    y = y * gamma_ref[:]
    out_ref[:] = (res_ref[:].astype(jnp.float32) + y).astype(out_ref.dtype)


def fused_ln_mlp_residual(x, residual, ln_scale, ln_bias, w1, b1, w2, b2,
                          gamma, *, eps: float = 1e-6,
                          row_tile: int = ROW_TILE,
                          interpret: bool = False):
    """out = residual + gamma * Dense2(gelu(Dense1(LN(x)))).

    In a ConvNeXt block, ``x`` is the depthwise-conv output and
    ``residual`` is the block input (the skip wraps the whole body).

    Args:
      x, residual: [..., C] (same shape; any float dtype).
      ln_scale, ln_bias: [C].
      w1: [C, H]; b1: [H]; w2: [H, C]; b2: [C]; gamma: [C] layer scale.

    Returns same shape/dtype as residual.
    """
    orig_shape = x.shape
    c = orig_shape[-1]
    hdim = w1.shape[1]
    rows = 1
    for d in orig_shape[:-1]:
        rows *= d
    xf = x.reshape(rows, c)
    rf = residual.reshape(rows, c)

    num_tiles = pl.cdiv(rows, row_tile)
    pad = num_tiles * row_tile - rows
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
        rf = jnp.pad(rf, ((0, pad), (0, 0)))

    kernel = functools.partial(_kernel, eps=eps)
    space = pl.ANY if interpret else pltpu.VMEM

    def rep(i):
        return (0, 0)

    out = pl.pallas_call(
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
            pl.BlockSpec((1, c), rep, memory_space=space),
        ],
        out_specs=pl.BlockSpec((row_tile, c), lambda i: (i, 0),
                               memory_space=space),
        out_shape=jax.ShapeDtypeStruct((num_tiles * row_tile, c),
                                       residual.dtype),
        interpret=interpret,
    )(xf, rf,
      jnp.asarray(ln_scale, jnp.float32).reshape(1, c),
      jnp.asarray(ln_bias, jnp.float32).reshape(1, c),
      jnp.asarray(w1, jnp.bfloat16),
      jnp.asarray(b1, jnp.float32).reshape(1, hdim),
      jnp.asarray(w2, jnp.bfloat16),
      jnp.asarray(b2, jnp.float32).reshape(1, c),
      jnp.asarray(gamma, jnp.float32).reshape(1, c))
    return out[:rows].reshape(orig_shape)


# ---------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward, XLA-vjp backward
# ---------------------------------------------------------------------------
def _mlp_body(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma, eps):
    """Reference body (tanh-GELU, matching the kernel) used for the
    backward pass and as the CPU fallback."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    n = (x32 - mu) * jax.lax.rsqrt(var + eps)
    n = n * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    h = n.astype(jnp.bfloat16) @ w1.astype(jnp.bfloat16)
    h = h.astype(jnp.float32) + b1.astype(jnp.float32)
    a = jax.nn.gelu(h, approximate=True)
    y = a.astype(jnp.bfloat16) @ w2.astype(jnp.bfloat16)
    y = y.astype(jnp.float32) + b2.astype(jnp.float32)
    return y * gamma.astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_ln_mlp_residual_ad(x, residual, ln_scale, ln_bias, w1, b1, w2,
                             b2, gamma, eps=1e-6, use_pallas=True):
    """Differentiable fused block body: Pallas kernel forward, backward by
    recomputation through the XLA reference body (a remat-style VJP — the
    4C-wide intermediates are never saved as residuals, only recomputed in
    the backward). Training-capable counterpart of
    :func:`fused_ln_mlp_residual`.

    Note: uses tanh-approximate GELU in BOTH passes (the exact erf GELU
    has no Pallas TPU lowering); the standard flax module uses exact GELU,
    so enable fused blocks consistently for a whole run.
    """
    if use_pallas:
        return fused_ln_mlp_residual(x, residual, ln_scale, ln_bias, w1,
                                     b1, w2, b2, gamma, eps=eps)
    return (residual.astype(jnp.float32)
            + _mlp_body(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                        eps)).astype(residual.dtype)


def _fused_ad_fwd(x, residual, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                  eps, use_pallas):
    out = fused_ln_mlp_residual_ad(x, residual, ln_scale, ln_bias, w1, b1,
                                   w2, b2, gamma, eps, use_pallas)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2, gamma)


def _mlp_body_manual_bwd(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma, g,
                         eps):
    """Hand-written backward of :func:`_mlp_body` — the same math as the
    Pallas kernel (ops/pallas/fused_mlp_bwd.py) in plain XLA ops.

    Versus ``jax.vjp(_mlp_body)`` (which re-runs the forward inside the
    backward: 2 recompute + 4 backward GEMMs), this recomputes only to
    the GELU input and derives the y-dependent gradients algebraically —
    5 R·C·4C GEMMs instead of 6 (gamma is per-channel, so it factors out
    of every row reduction):

        dw2    = gamma ⊙ (a^T @ g)
        db2    = gamma ⊙ Σ_r g
        dgamma = Σ_k (a^T @ g)[k,:]·w2[k,:] + b2 ⊙ Σ_r g

    Used for the stages whose weight-grad accumulators exceed the Pallas
    kernel's VMEM budget (C=768) and as the CPU fallback backward.
    """
    c = x.shape[-1]
    x2 = x.reshape(-1, c)
    g32 = g.astype(jnp.float32).reshape(-1, c)

    x32 = x2.astype(jnp.float32)
    mu = jnp.mean(x32, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mu) * inv
    ls32 = ln_scale.astype(jnp.float32)
    n = xhat * ls32 + ln_bias.astype(jnp.float32)
    nb = n.astype(jnp.bfloat16)
    w1b = w1.astype(jnp.bfloat16)
    w2b = w2.astype(jnp.bfloat16)
    h = jnp.dot(nb, w1b, preferred_element_type=jnp.float32) \
        + b1.astype(jnp.float32)
    # tanh-GELU value + derivative (matches jax.nn.gelu approximate=True)
    sq2pi, kappa = 0.7978845608028654, 0.044715
    u = sq2pi * (h + kappa * h * h * h)
    t = jnp.tanh(u)
    a = 0.5 * h * (1.0 + t)
    dgelu = (0.5 * (1.0 + t)
             + 0.5 * h * (1.0 - t * t) * sq2pi * (1.0 + 3 * kappa * h * h))
    ab = a.astype(jnp.bfloat16)

    gam = gamma.astype(jnp.float32)
    dyb = (g32 * gam).astype(jnp.bfloat16)
    gb = g32.astype(jnp.bfloat16)
    da = jax.lax.dot_general(dyb, w2b, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dh = da * dgelu
    dhb = dh.astype(jnp.bfloat16)
    dn = jax.lax.dot_general(dhb, w1b, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)

    dw1 = jax.lax.dot_general(nb, dhb, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dw2r = jax.lax.dot_general(ab, gb, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dw2 = dw2r * gam[None, :]
    db1 = jnp.sum(dh, axis=0)
    sg = jnp.sum(g32, axis=0)
    db2 = gam * sg
    dgamma = (jnp.sum(dw2r * w2b.astype(jnp.float32), axis=0)
              + b2.astype(jnp.float32) * sg)

    dnh = dn * ls32
    m1 = jnp.mean(dnh, axis=1, keepdims=True)
    m2 = jnp.mean(dnh * xhat, axis=1, keepdims=True)
    dx = (inv * (dnh - m1 - xhat * m2)).reshape(x.shape)
    dls = jnp.sum(dn * xhat, axis=0)
    dlb = jnp.sum(dn, axis=0)
    return dx, dls, dlb, dw1, db1, dw2, db2, dgamma


def _fused_ad_bwd(eps, use_pallas, res, g):
    x, ln_scale, ln_bias, w1, b1, w2, b2, gamma = res
    # c=768 (stage 4) exceeds the 16 MB VMEM limit in the fused backward:
    # the two f32 weight-grad accumulators alone are 2 x 9.4 MB. Stage 4
    # gets the 5-GEMM manual XLA backward; every narrower stage gets the
    # Pallas kernel.
    if use_pallas and x.shape[-1] <= 384:
        # hand-written Pallas backward: recompute + all four backward
        # GEMMs in one kernel, 4C intermediates never touch HBM
        # (ops/pallas/fused_mlp_bwd.py)
        from .fused_mlp_bwd import fused_mlp_bwd
        dx, dls, dlb, dw1, db1, dw2, db2, dgamma = fused_mlp_bwd(
            x, g, ln_scale, ln_bias, w1, b1, w2, b2, gamma, eps=eps)
    else:
        dx, dls, dlb, dw1, db1, dw2, db2, dgamma = _mlp_body_manual_bwd(
            x, ln_scale, ln_bias, w1, b1, w2, b2, gamma, g, eps)
    # the residual's gradient is the cotangent itself (identity path);
    # g already carries the output (= residual) dtype
    return (dx.astype(x.dtype), g,
            dls.astype(ln_scale.dtype).reshape(ln_scale.shape),
            dlb.astype(ln_bias.dtype).reshape(ln_bias.shape),
            dw1.astype(w1.dtype), db1.astype(b1.dtype).reshape(b1.shape),
            dw2.astype(w2.dtype), db2.astype(b2.dtype).reshape(b2.shape),
            dgamma.astype(gamma.dtype).reshape(gamma.shape))


fused_ln_mlp_residual_ad.defvjp(_fused_ad_fwd, _fused_ad_bwd)
