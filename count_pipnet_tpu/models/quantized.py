"""Int8 quantized ConvNeXt serving path.

The inference FLOPs live almost entirely in the block pointwise layers
(pw1/pw2 expand/project GEMMs — stage 3/4 alone are ~34 of the ~37
GFLOPs/img of the stride-surgery ConvNeXt-Tiny). The TPU MXU runs int8 at
2x the bf16 rate, so for serving we quantize exactly those GEMMs:

* weights: symmetric per-output-channel int8 (static, quantized once from
  the trained fp32 params);
* activations: symmetric per-row (per-patch) dynamic int8, computed on the
  fly from the bf16 tensor;
* accumulation in int32, dequantized with the product of both scales;
* everything else (stem, depthwise 7x7, LayerNorm, GELU, layer-scale,
  residuals) stays bf16 — negligible FLOPs, precision-sensitive.

This is a deployment-only path: training and the parity forward use the
flax module (models/convnext.py). No reference counterpart exists
(SURVEY.md §7 lists the int8/bf16 inference path as rebuild perf work).
"""


from typing import Dict

import jax
import jax.numpy as jnp

from .convnext import CONVNEXT_TINY_STAGES

__all__ = ["quantize_convnext_params", "quant_convnext_apply",
           "int8_rowwise_matmul", "fused_convnext_apply",
           "fused_block_convnext_apply", "calibrate_act_scales"]


def _quantize_weight(kernel):
    """[in, out] fp32 -> (int8 [in, out], f32 scale [out])."""
    amax = jnp.max(jnp.abs(kernel), axis=0)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def int8_rowwise_matmul(x, wq, wscale):
    """Dynamic per-row int8 x static per-channel int8 -> fp32.

    x: [..., K] float; wq: [K, N] int8; wscale: [N].
    """
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
    ascale = jnp.where(amax > 0, amax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / ascale),
                  -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * ascale * wscale


def quantize_convnext_params(params: Dict) -> Dict:
    """Quantize every block's pw1/pw2 Dense kernels in a ConvNeXtFeatures
    param tree. Returns a new tree where each quantized layer holds
    {"q": int8 kernel, "scale": per-out-channel f32, "bias": f32}; all
    other leaves pass through unchanged."""
    out = {}
    for scope, sub in params.items():
        if "_block_" in scope:
            new_sub = dict(sub)
            for name in ("pw1", "pw2"):
                k = sub[name]["kernel"]
                q, scale = _quantize_weight(jnp.asarray(k, jnp.float32))
                new_sub[name] = {"q": q, "scale": scale,
                                 "bias": sub[name]["bias"]}
            out[scope] = new_sub
        else:
            out[scope] = sub
    return out


def _layer_norm(x, scale, bias, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias)


def _conv(x, kernel, bias, stride, dtype):
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype),
        window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(dtype)


def _dwconv7(x, kernel, bias, dtype):
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), window_strides=(1, 1),
        padding=((3, 3), (3, 3)), feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(dtype)


def fused_convnext_apply(params: Dict, x, *, stride_threshold: int = 100,
                         num_stages: int = 7,
                         stage_settings=CONVNEXT_TINY_STAGES,
                         dtype=jnp.bfloat16, interpret: bool = False):
    """bf16 inference forward using the fused LN->MLP->residual Pallas
    kernel (ops/pallas/fused_mlp.py) for every block body — one HBM
    round-trip per block instead of one per op. Takes the ORIGINAL
    (unquantized) ConvNeXtFeatures param tree; mirrors
    ConvNeXtFeatures.__call__."""
    from ..ops.pallas.fused_mlp import fused_ln_mlp_residual

    stem = params["features_0"]
    h = _conv(x, stem["conv"]["kernel"], stem["conv"]["bias"], 4, dtype)
    h = _layer_norm(h, stem["norm"]["scale"], stem["norm"]["bias"]) \
        .astype(dtype)

    feat_idx = 1
    for k, (dim, n_blocks) in enumerate(stage_settings):
        if k > 0:
            if feat_idx > num_stages:
                break
            ds = params[f"features_{feat_idx}"]
            in_ch = stage_settings[k - 1][0]
            stride = 1 if in_ch > stride_threshold else 2
            hn = _layer_norm(h, ds["norm"]["scale"], ds["norm"]["bias"]) \
                .astype(dtype)
            h = _conv(hn, ds["conv"]["kernel"], ds["conv"]["bias"], stride,
                      dtype)
            feat_idx += 1
        if feat_idx > num_stages:
            break
        for j in range(n_blocks):
            blk = params[f"features_{feat_idx}_block_{j}"]
            # block = h + gamma * mlp(LN(dw(h))): the skip wraps the whole
            # body, so the kernel takes dw(h) as its LN input and h as the
            # residual source.
            # NOTE: a Pallas whole-plane dwconv (ops/pallas/dwconv.py) was
            # measured 2.5x SLOWER than XLA's lowering (unaligned shifted
            # slices force relayouts); XLA keeps this op.
            y = _dwconv7(h, blk["dwconv"]["kernel"], blk["dwconv"]["bias"],
                         dtype)
            h = fused_ln_mlp_residual(
                y, h, blk["norm"]["scale"], blk["norm"]["bias"],
                blk["pw1"]["kernel"], blk["pw1"]["bias"],
                blk["pw2"]["kernel"], blk["pw2"]["bias"],
                blk["layer_scale"], interpret=interpret)
        feat_idx += 1
    return h


def calibrate_act_scales(params: Dict, x, *, stride_threshold: int = 100,
                         num_stages: int = 7,
                         stage_settings=CONVNEXT_TINY_STAGES,
                         margin: float = 1.0) -> Dict:
    """Per-block activation calibration for the STATIC int8 serving mode.

    Runs an f32 XLA forward mirroring :func:`fused_block_convnext_apply`
    and records, for every block, the per-channel abs-max of the two int8
    GEMM inputs (LayerNorm output [C] and GELU output [4C]). The returned
    dict {block_scope: (amax_ln, amax_gelu)} feeds the kernels'
    static-quantization path, which replaces the per-row dynamic
    lane-reduce+divide with one broadcast multiply (the scales themselves
    are folded into the weight quantization —
    ops/pallas/fused_block.py:quantize_block_weights_folded).

    ``margin`` head-rooms the maxima for inputs beyond the calibration
    batch; values past amax*margin are clipped to +-127 by the kernel.
    """
    scales = {}
    stem = params["features_0"]
    h = _conv(x, stem["conv"]["kernel"], stem["conv"]["bias"], 4,
              jnp.float32)
    h = _layer_norm(h, stem["norm"]["scale"], stem["norm"]["bias"])

    feat_idx = 1
    for k, (dim, n_blocks) in enumerate(stage_settings):
        if k > 0:
            if feat_idx > num_stages:
                break
            ds = params[f"features_{feat_idx}"]
            in_ch = stage_settings[k - 1][0]
            stride = 1 if in_ch > stride_threshold else 2
            hn = _layer_norm(h, ds["norm"]["scale"], ds["norm"]["bias"])
            h = _conv(hn, ds["conv"]["kernel"], ds["conv"]["bias"], stride,
                      jnp.float32)
            feat_idx += 1
        if feat_idx > num_stages:
            break
        for j in range(n_blocks):
            scope = f"features_{feat_idx}_block_{j}"
            blk = params[scope]
            y = _dwconv7(h, blk["dwconv"]["kernel"], blk["dwconv"]["bias"],
                         jnp.float32)
            n = _layer_norm(y, blk["norm"]["scale"], blk["norm"]["bias"])
            hid = n @ jnp.asarray(blk["pw1"]["kernel"], jnp.float32)
            hid = hid + jnp.asarray(blk["pw1"]["bias"], jnp.float32)
            a = jax.nn.gelu(hid, approximate=True)
            out = a @ jnp.asarray(blk["pw2"]["kernel"], jnp.float32)
            out = out + jnp.asarray(blk["pw2"]["bias"], jnp.float32)
            h = h + out * jnp.asarray(blk["layer_scale"], jnp.float32)
            red = tuple(range(n.ndim - 1))
            scales[scope] = (jnp.max(jnp.abs(n), axis=red) * margin,
                             jnp.max(jnp.abs(a), axis=red) * margin)
        feat_idx += 1
    return scales


def fused_block_convnext_apply(params: Dict, x, *,
                               stride_threshold: int = 100,
                               num_stages: int = 7,
                               stage_settings=CONVNEXT_TINY_STAGES,
                               dtype=jnp.bfloat16,
                               int8_min_dim: int = None,
                               int8_downsample: bool = False,
                               dw_bf16: bool = False,
                               padded_planes: bool = True,
                               padded_max_dim: int = 384,
                               inkernel_pad: bool = False,
                               act_scales: Dict = None,
                               gumbel_head: Dict = None,
                               interpret: bool = False):
    """Serving forward with ONE Pallas kernel per ConvNeXt block
    (ops/pallas/fused_block.py: dwconv + LN + MLP + layer-scale +
    residual, planes kept flattened [B, H*W, C] across each stage).
    Stages whose width is >= ``int8_min_dim`` run their pointwise GEMMs
    in int8 (measured 125-207 TF/s vs the 126 TF/s bf16 ceiling). The
    default (``int8_min_dim=None``) depends on ``act_scales``: with
    calibrated static scales the quant cost is one broadcast multiply
    and int8 is a small win at every width (+0.8% end-to-end at C>=96,
    scripts/bench_int8_stage2.py, exact argmax agreement) -> 96; the
    round-2 DYNAMIC per-row quantization only breaks even at C=384
    (the lane-reduce+divide costs ~0.9 ms/block below that,
    BENCH_NOTES.md) -> 384 when no scales are given. In-block int8
    noise is suppressed by the tiny layer-scale on the branch, so counts
    and top-1 agree exactly with the bf16 path; ``int8_downsample``
    additionally quantizes the wide stride-1 downsample GEMM (~4%
    faster) but that output is NOT residual-scaled, so exact top-1
    agreement is lost — off by default. Takes the ORIGINAL
    ConvNeXtFeatures param tree; mirrors ConvNeXtFeatures.__call__.

    ``gumbel_head``: optional dict {"seed": int32, "noise": optional
    [B, H, W, C] pre-drawn Gumbel} — fuses the gumbel-hard counting head
    into the FINAL block's kernel (the feature plane never leaves VMEM;
    ops/pallas/gumbel_head.py:fused_block_gumbel_counts) and returns
    [B, C] counts instead of feature planes. Only meaningful when the
    model's prototype dim equals the backbone output dim (no add-on
    1x1 conv, i.e. num_features=0 — the bench/serving headline config).
    Falls back to block-then-head when the final block runs in the
    padded-plane branch (narrow final stages)."""
    from ..ops.pallas.fused_block import fused_block_apply

    if int8_min_dim is None:
        int8_min_dim = 96 if act_scales else 384

    # (feat_idx, block_j) of the LAST executed block — the fused-head
    # target. Mirrors the loop's index arithmetic below.
    last_block = None
    if gumbel_head is not None:
        fi = 1
        for k, (_, nb) in enumerate(stage_settings):
            if k > 0:
                if fi > num_stages:
                    break
                fi += 1
            if fi > num_stages:
                break
            last_block = (fi, nb - 1)
            fi += 1

    stem = params["features_0"]
    h = _conv(x, stem["conv"]["kernel"], stem["conv"]["bias"], 4, dtype)
    h = _layer_norm(h, stem["norm"]["scale"], stem["norm"]["bias"]) \
        .astype(dtype)

    feat_idx = 1
    for k, (dim, n_blocks) in enumerate(stage_settings):
        if k > 0:
            if feat_idx > num_stages:
                break
            ds = params[f"features_{feat_idx}"]
            in_ch = stage_settings[k - 1][0]
            stride = 1 if in_ch > stride_threshold else 2
            hn = _layer_norm(h, ds["norm"]["scale"], ds["norm"]["bias"]) \
                .astype(dtype)
            if stride == 1 and in_ch >= int8_min_dim and int8_downsample:
                # Wide stride-1 downsample (stage3->4 after stride
                # surgery): 2x2 im2col + int8 GEMM (K=4*in_ch) — XLA's
                # bf16 conv runs this at 62 TF/s, the int8 kernel ~200.
                from ..ops.pallas.int8_gemm import int8_quant_gemm
                bsz, ih, iw, _ = hn.shape
                cols = jnp.concatenate(
                    [hn[:, :-1, :-1], hn[:, :-1, 1:],
                     hn[:, 1:, :-1], hn[:, 1:, 1:]], axis=-1)
                ho, wo = ih - 1, iw - 1
                kmat = jnp.asarray(ds["conv"]["kernel"], jnp.float32) \
                    .reshape(4 * in_ch, dim)
                y = int8_quant_gemm(
                    cols.reshape(bsz * ho * wo, 4 * in_ch), kmat,
                    bias=ds["conv"]["bias"], out_dtype=dtype,
                    interpret=interpret)
                h = y.reshape(bsz, ho, wo, dim)
            else:
                h = _conv(hn, ds["conv"]["kernel"], ds["conv"]["bias"],
                          stride, dtype)
            feat_idx += 1
        if feat_idx > num_stages:
            break
        b, hh, ww, c = h.shape
        use_int8 = c >= int8_min_dim
        if padded_planes and c <= padded_max_dim:
            # zero-padded plane layout: vertical dwconv taps become
            # aligned static slices, horizontal rolls need no masks
            # (ops/pallas/fused_block.py:_dwconv_pad; bit-identical,
            # measured -12% on stage-1 blocks / -4% on stage 3).
            # NOT at stage-4 width: the pad rows are +23% there and the
            # [*, (26+6)*32, 768] blocks exceed the 16 MB scoped-VMEM
            # limit (measured compile OOM on v5e).
            # ``inkernel_pad``: the first/last block of the stage
            # marshal the pad layout in VMEM instead of standalone XLA
            # pad/slice ops (the round-5 device trace priced those at
            # ~2 ms/step at batch 256).
            from ..ops.pallas.fused_block import (
                fused_block_apply_padded, pad_planes, unpad_planes,
            )
            xp = h if inkernel_pad else pad_planes(h)
            for j in range(n_blocks):
                scope = f"features_{feat_idx}_block_{j}"
                blk = params[scope]
                xp = fused_block_apply_padded(
                    xp, hh, ww, blk["dwconv"]["kernel"],
                    blk["dwconv"]["bias"], blk["norm"]["scale"],
                    blk["norm"]["bias"], blk["pw1"]["kernel"],
                    blk["pw1"]["bias"], blk["pw2"]["kernel"],
                    blk["pw2"]["bias"], blk["layer_scale"],
                    int8=use_int8,
                    act_scales=(act_scales or {}).get(scope),
                    pad_in=inkernel_pad and j == 0,
                    unpad_out=inkernel_pad and j == n_blocks - 1,
                    dw_bf16=dw_bf16, interpret=interpret)
            h = xp if inkernel_pad else unpad_planes(xp, hh, ww)
        else:
            flat = h.reshape(b, hh * ww, c)
            for j in range(n_blocks):
                scope = f"features_{feat_idx}_block_{j}"
                blk = params[scope]
                if last_block == (feat_idx, j):
                    from ..ops.pallas.gumbel_head import \
                        fused_block_gumbel_counts
                    nz = gumbel_head.get("noise")
                    scales = (act_scales or {}).get(scope)
                    # the fused kernel carries only the static-scale
                    # int8 mode; without calibration it runs bf16
                    return fused_block_gumbel_counts(
                        flat, hh, ww, blk["dwconv"]["kernel"],
                        blk["dwconv"]["bias"], blk["norm"]["scale"],
                        blk["norm"]["bias"], blk["pw1"]["kernel"],
                        blk["pw1"]["bias"], blk["pw2"]["kernel"],
                        blk["pw2"]["bias"], blk["layer_scale"],
                        gumbel_head.get("seed", 0),
                        int8=use_int8 and scales is not None,
                        act_scales=scales,
                        noise=None if nz is None
                        else nz.reshape(b, hh * ww, c),
                        interpret=interpret)
                flat = fused_block_apply(
                    flat, hh, ww, blk["dwconv"]["kernel"],
                    blk["dwconv"]["bias"], blk["norm"]["scale"],
                    blk["norm"]["bias"], blk["pw1"]["kernel"],
                    blk["pw1"]["bias"], blk["pw2"]["kernel"],
                    blk["pw2"]["bias"], blk["layer_scale"],
                    int8=use_int8,
                    act_scales=(act_scales or {}).get(scope),
                    dw_bf16=dw_bf16, interpret=interpret)
            h = flat.reshape(b, hh, ww, c)
        feat_idx += 1
    if gumbel_head is not None:
        # final block ran in the padded branch: plain block-then-head
        from ..ops.pallas.gumbel_head import gumbel_hard_counts
        return gumbel_hard_counts(h, gumbel_head.get("seed", 0),
                                  interpret=interpret,
                                  noise=gumbel_head.get("noise"))
    return h


def quant_convnext_apply(qparams: Dict, x, *, stride_threshold: int = 100,
                         num_stages: int = 7,
                         stage_settings=CONVNEXT_TINY_STAGES,
                         dtype=jnp.bfloat16):
    """Forward through the quantized ConvNeXt (mirrors
    ConvNeXtFeatures.__call__, models/convnext.py)."""
    stem = qparams["features_0"]
    h = _conv(x, stem["conv"]["kernel"], stem["conv"]["bias"], 4, dtype)
    h = _layer_norm(h, stem["norm"]["scale"], stem["norm"]["bias"]) \
        .astype(dtype)

    feat_idx = 1
    for k, (dim, n_blocks) in enumerate(stage_settings):
        if k > 0:
            if feat_idx > num_stages:
                break
            ds = qparams[f"features_{feat_idx}"]
            in_ch = stage_settings[k - 1][0]
            stride = 1 if in_ch > stride_threshold else 2
            hn = _layer_norm(h, ds["norm"]["scale"], ds["norm"]["bias"]) \
                .astype(dtype)
            h = _conv(hn, ds["conv"]["kernel"], ds["conv"]["bias"], stride,
                      dtype)
            feat_idx += 1
        if feat_idx > num_stages:
            break
        for j in range(n_blocks):
            blk = qparams[f"features_{feat_idx}_block_{j}"]
            r = h
            y = _dwconv7(h, blk["dwconv"]["kernel"], blk["dwconv"]["bias"],
                         dtype)
            y = _layer_norm(y, blk["norm"]["scale"], blk["norm"]["bias"])
            y = int8_rowwise_matmul(y, blk["pw1"]["q"],
                                    blk["pw1"]["scale"])
            y = y + blk["pw1"]["bias"]
            y = jax.nn.gelu(y, approximate=False)
            y = int8_rowwise_matmul(y, blk["pw2"]["q"],
                                    blk["pw2"]["scale"])
            y = y + blk["pw2"]["bias"]
            y = y * blk["layer_scale"]
            h = r + y.astype(dtype)
        feat_idx += 1
    return h
