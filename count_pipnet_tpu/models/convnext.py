"""ConvNeXt-Tiny backbone, TPU-native (flax/linen, NHWC, bf16-friendly).

Capability parity with the reference's torchvision-based backbone factory
(reference: features/convnext_features.py):

* stride surgery — every stride-2 conv whose ``in_channels`` exceeds a
  threshold gets stride 1 (threshold 100 -> 26x26 latents at 224 input,
  "convnext_tiny_26"; threshold 300 -> 13x13, "convnext_tiny_13";
  reference convnext_features.py:5-15);
* mid-layer truncation — keep only the stem plus the first ``num_stages``
  of the 7 feature stages (reference convnext_features.py:17-36);
* pretrained ImageNet weights via :func:`convert_torchvision_convnext`
  (torch state_dict -> flax params; requires a locally available torchvision
  checkpoint since this environment has no network egress).

Design notes (TPU-first, not a translation):
* NHWC everywhere — channels-last is the native TPU conv layout, and it
  makes ConvNeXt's LayerNorm/Dense block body free of the reference's
  permute round-trips (torchvision CNBlock permutes NCHW<->NHWC per block).
* compute dtype is a constructor arg (bf16 on TPU, fp32 params).
* stage/block module names mirror torchvision's ``features.{i}.{j}``
  indexing so the optimizer param-grouping rules (reference
  util/args.py:273-279,333-402) apply to path prefixes unchanged.
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

__all__ = [
    "ConvNeXtFeatures",
    "convnext_tiny_26_features",
    "convnext_tiny_13_features",
    "convert_torchvision_convnext",
    "CONVNEXT_TINY_STAGES",
]

# (out_channels, num_blocks) per ConvNeXt-Tiny stage.
CONVNEXT_TINY_STAGES = ((96, 3), (192, 3), (384, 9), (768, 3))

trunc_normal_02 = nn.initializers.truncated_normal(stddev=0.02)


class _LNParams(nn.Module):
    """Parameter-only LayerNorm scope (same tree as nn.LayerNorm)."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return s, b


class _DenseParams(nn.Module):
    """Parameter-only Dense scope (same tree as nn.Dense)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", trunc_normal_02,
                       (self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _ConvParams(nn.Module):
    """Parameter-only Conv scope (same tree as nn.Conv)."""

    kernel_shape: tuple
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", trunc_normal_02, self.kernel_shape)
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class CNBlock(nn.Module):
    """ConvNeXt block: dw-conv7x7 -> LN -> Dense 4d -> GELU -> Dense d,
    layer-scale, stochastic depth, residual.

    With ``fused_mlp`` the LN->MLP->scale->residual body runs through the
    differentiable Pallas kernel (ops/pallas/fused_mlp.py: Pallas forward,
    remat-style XLA backward; tanh-approx GELU). Parameter tree is
    identical either way, so checkpoints are interchangeable.
    """

    dim: int
    sd_prob: float = 0.0
    layer_scale_init: float = 1e-6
    dtype: Any = jnp.float32
    fused_mlp: bool = False
    fused_whole_block: bool = False
    fused_dwconv: bool = False

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.fused_whole_block:
            # Whole-block Pallas forward (dwconv included — its output and
            # the 4C intermediate never touch HBM), XLA-recompute backward
            # (ops/pallas/fused_block.fused_block_ad). Same param tree as
            # the standard path — checkpoints interchange.
            from ..ops.pallas.fused_block import fused_block_ad
            dwk, dwb = _ConvParams((7, 7, 1, self.dim), self.dim,
                                   name="dwconv")()
            gamma = self.param(
                "layer_scale",
                nn.initializers.constant(self.layer_scale_init),
                (self.dim,))
            ls, lb = _LNParams(self.dim, name="norm")()
            w1, b1 = _DenseParams(self.dim, 4 * self.dim, name="pw1")()
            w2, b2 = _DenseParams(4 * self.dim, self.dim, name="pw2")()
            use_pallas = jax.devices()[0].platform not in ("cpu",)
            z = fused_block_ad(x, dwk, dwb, ls, lb, w1, b1, w2, b2,
                               gamma, 1e-6, use_pallas)
            if self.sd_prob > 0.0 and not deterministic:
                keep = 1.0 - self.sd_prob
                rng = self.make_rng("droppath")
                mask = jax.random.bernoulli(rng, keep,
                                            (z.shape[0], 1, 1, 1))
                z = x + (z - x) * mask.astype(z.dtype) / keep
            return z
        if self.fused_dwconv:
            # Pallas channels-to-lanes forward, XLA conv vjp backward
            # (ops/pallas/dwconv_bwd.dwconv7_pfwd_ad). Same "dwconv"
            # param tree as nn.Conv — checkpoints interchange.
            from ..ops.pallas.dwconv_bwd import dwconv7_pfwd_ad
            dwk, dwb = _ConvParams((7, 7, 1, self.dim), self.dim,
                                   name="dwconv")()
            use_pallas = jax.devices()[0].platform not in ("cpu",)
            h = dwconv7_pfwd_ad(x, dwk, dwb, self.dtype, use_pallas)
        else:
            h = nn.Conv(
                self.dim, (7, 7), padding=3,
                feature_group_count=self.dim, dtype=self.dtype,
                kernel_init=trunc_normal_02, name="dwconv",
            )(x)
        gamma = self.param(
            "layer_scale",
            nn.initializers.constant(self.layer_scale_init),
            (self.dim,),
        )
        if self.fused_mlp:
            from ..ops.pallas.fused_mlp import fused_ln_mlp_residual_ad
            ls, lb = _LNParams(self.dim, name="norm")()
            w1, b1 = _DenseParams(self.dim, 4 * self.dim, name="pw1")()
            w2, b2 = _DenseParams(4 * self.dim, self.dim, name="pw2")()
            use_pallas = jax.devices()[0].platform not in ("cpu",)
            z = fused_ln_mlp_residual_ad(h, x, ls, lb, w1, b1, w2, b2,
                                         gamma, 1e-6, use_pallas)
            if self.sd_prob > 0.0 and not deterministic:
                keep = 1.0 - self.sd_prob
                rng = self.make_rng("droppath")
                mask = jax.random.bernoulli(rng, keep,
                                            (z.shape[0], 1, 1, 1))
                # z = x + branch; droppath scales the branch only
                z = x + (z - x) * mask.astype(z.dtype) / keep
            return z
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype,
                     kernel_init=trunc_normal_02, name="pw1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype,
                     kernel_init=trunc_normal_02, name="pw2")(h)
        h = h * gamma.astype(h.dtype)
        if self.sd_prob > 0.0 and not deterministic:
            keep = 1.0 - self.sd_prob
            rng = self.make_rng("droppath")
            mask = jax.random.bernoulli(rng, keep, (h.shape[0], 1, 1, 1))
            h = h * mask.astype(h.dtype) / keep
        return x + h


class Downsample(nn.Module):
    """LayerNorm + 2x2 conv; stride 2 unless surgically reduced to 1."""

    dim: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        h = nn.Conv(
            self.dim, (2, 2), strides=self.stride, padding="VALID",
            dtype=self.dtype, kernel_init=trunc_normal_02, name="conv",
        )(h)
        return h


class Stem(nn.Module):
    """4x4 stride-4 patchify conv + LayerNorm."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(
            self.dim, (4, 4), strides=4, padding="VALID", dtype=self.dtype,
            kernel_init=trunc_normal_02, name="conv",
        )(x)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(h)
        return h


class ConvNeXtFeatures(nn.Module):
    """ConvNeXt feature extractor (classifier/avgpool stripped).

    Stage layout mirrors torchvision: features_0 = stem, features_{2k-1} =
    block stage k, features_{2k} = downsample into stage k+1. ``num_stages``
    truncates to the stem + first num_stages of features_1..features_7
    (reference convnext_features.py:17-36). ``stride_threshold``: a
    downsample conv with in_channels > threshold runs at stride 1
    (reference convnext_features.py:5-15).
    """

    stage_settings: Sequence = CONVNEXT_TINY_STAGES
    stride_threshold: int = 100
    num_stages: int = 7  # 7 = full network
    stochastic_depth_prob: float = 0.1
    dtype: Any = jnp.float32
    fused_mlp: bool = False
    fused_whole_block: bool = False
    fused_dwconv: bool = False

    @property
    def out_channels(self) -> int:
        """Channels of the final kept stage (reference
        count_pipnet.py:438-463 detects this from the last conv)."""
        chans = [self.stage_settings[0][0]]  # features_1 works at stem dim
        for k in range(1, len(self.stage_settings)):
            chans.append(self.stage_settings[k][0])  # features_{2k}, {2k+1}
        # features index -> channel map: 1->c0, 2->c1, 3->c1, 4->c2, 5->c2,
        # 6->c3, 7->c3
        idx_to_ch = {}
        for i in range(1, 8):
            idx_to_ch[i] = chans[i // 2]
        return idx_to_ch[min(self.num_stages, 7)]

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        total_blocks = sum(n for _, n in self.stage_settings)
        sd = self.stochastic_depth_prob
        block_id = 0

        h = Stem(self.stage_settings[0][0], dtype=self.dtype,
                 name="features_0")(x)

        feat_idx = 1
        for k, (dim, n_blocks) in enumerate(self.stage_settings):
            if k > 0:
                # Downsample from previous stage's dim into this one.
                if feat_idx > self.num_stages:
                    break
                in_ch = self.stage_settings[k - 1][0]
                stride = 1 if in_ch > self.stride_threshold else 2
                h = Downsample(dim, stride=stride, dtype=self.dtype,
                               name=f"features_{feat_idx}")(h)
                feat_idx += 1
            if feat_idx > self.num_stages:
                break
            # Block stage — a named scope per torchvision block index.
            stage_name = f"features_{feat_idx}"
            for j in range(n_blocks):
                prob = sd * float(block_id) / max(total_blocks - 1.0, 1.0)
                h = CNBlock(
                    dim, sd_prob=prob, dtype=self.dtype,
                    fused_mlp=self.fused_mlp,
                    fused_whole_block=self.fused_whole_block,
                    fused_dwconv=self.fused_dwconv,
                    name=f"{stage_name}_block_{j}",
                )(h, deterministic=deterministic)
                block_id += 1
            feat_idx += 1
        return h


def convnext_tiny_26_features(num_stages: int = 7, dtype=jnp.float32,
                              stochastic_depth_prob: float = 0.1,
                              fused_mlp: bool = False,
                              fused_whole_block: bool = False,
                              fused_dwconv: bool = False):
    """Stride threshold 100 -> 26x26 latent at 224 input
    (reference convnext_features.py:38-65)."""
    return ConvNeXtFeatures(
        stride_threshold=100, num_stages=num_stages, dtype=dtype,
        stochastic_depth_prob=stochastic_depth_prob, fused_mlp=fused_mlp,
        fused_whole_block=fused_whole_block, fused_dwconv=fused_dwconv,
    )


def convnext_tiny_13_features(num_stages: int = 7, dtype=jnp.float32,
                              stochastic_depth_prob: float = 0.1,
                              fused_mlp: bool = False,
                              fused_whole_block: bool = False,
                              fused_dwconv: bool = False):
    """Stride threshold 300 -> 13x13 latent at 224 input
    (reference convnext_features.py:67-94)."""
    return ConvNeXtFeatures(
        stride_threshold=300, num_stages=num_stages, dtype=dtype,
        stochastic_depth_prob=stochastic_depth_prob, fused_mlp=fused_mlp,
        fused_whole_block=fused_whole_block, fused_dwconv=fused_dwconv,
    )


def get_feature_dimensions(use_mid_layers=False, num_stages=2,
                           input_size=224, stride_threshold=100):
    """Expected backbone output shape (NHWC) for a configuration without
    building parameters — closed-form spatial math (the reference runs a
    dummy forward, convnext_features.py:97-108).

    Spatial rule per feature index: stem /4; each downsample with
    in_channels <= threshold halves via floor((s-2)/2)+1; stride-1
    downsamples shrink by 1 (2x2 VALID conv).
    """
    model = ConvNeXtFeatures(
        stride_threshold=stride_threshold,
        num_stages=num_stages if use_mid_layers else 7)
    s = input_size // 4  # stem k4 s4 VALID
    dims = [96, 192, 384, 768]
    feat_idx = 1
    for k in range(4):
        if k > 0:
            if feat_idx > model.num_stages:
                break
            in_ch = dims[k - 1]
            if in_ch > stride_threshold:
                s = s - 1           # k2 s1 VALID
            else:
                s = (s - 2) // 2 + 1  # k2 s2 VALID
            feat_idx += 1
        if feat_idx > model.num_stages:
            break
        feat_idx += 1
    return (1, s, s, model.out_channels)


# ---------------------------------------------------------------------------
# torchvision -> flax weight conversion
# ---------------------------------------------------------------------------
def convert_torchvision_convnext(state_dict, num_stages: int = 7):
    """Convert a torchvision convnext_tiny state_dict to this module's params.

    Accepts either tensors or numpy arrays as values. Layout mapping:
      conv weight   [out, in, kh, kw] -> [kh, kw, in, out]
      depthwise     [dim, 1, 7, 7]    -> [7, 7, 1, dim]
      linear weight [out, in]         -> [in, out]
      layer_scale   [dim, 1, 1]       -> [dim]

    torchvision naming inside a block: block.0 dwconv, block.2 norm,
    block.3 linear1, block.5 linear2, plus top-level 'layer_scale'.
    Stage naming: features.0.{0,1} stem conv/norm; odd stages
    features.{i}.{j}.block.*; even stages features.{i}.{0,1} norm/conv.
    """
    import numpy as np

    def as_np(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v)

    sd = {k: as_np(v) for k, v in state_dict.items()}

    def conv_w(w):
        return np.transpose(w, (2, 3, 1, 0))

    def dense_w(w):
        return np.transpose(w, (1, 0))

    params = {}

    # Stem: features.0.0 conv, features.0.1 norm
    params["features_0"] = {
        "conv": {"kernel": conv_w(sd["features.0.0.weight"]),
                 "bias": sd["features.0.0.bias"]},
        "norm": {"scale": sd["features.0.1.weight"],
                 "bias": sd["features.0.1.bias"]},
    }

    stage_blocks = {1: 3, 3: 3, 5: 9, 7: 3}
    for i in range(1, min(num_stages, 7) + 1):
        if i % 2 == 1:  # block stage
            for j in range(stage_blocks[i]):
                pre = f"features.{i}.{j}.block"
                params[f"features_{i}_block_{j}"] = {
                    "dwconv": {
                        "kernel": conv_w(sd[f"{pre}.0.weight"]),
                        "bias": sd[f"{pre}.0.bias"],
                    },
                    "norm": {
                        "scale": sd[f"{pre}.2.weight"],
                        "bias": sd[f"{pre}.2.bias"],
                    },
                    "pw1": {
                        "kernel": dense_w(sd[f"{pre}.3.weight"]),
                        "bias": sd[f"{pre}.3.bias"],
                    },
                    "pw2": {
                        "kernel": dense_w(sd[f"{pre}.5.weight"]),
                        "bias": sd[f"{pre}.5.bias"],
                    },
                    "layer_scale": sd[f"features.{i}.{j}.layer_scale"]
                    .reshape(-1),
                }
        else:  # downsample stage: features.{i}.0 norm, features.{i}.1 conv
            params[f"features_{i}"] = {
                "norm": {"scale": sd[f"features.{i}.0.weight"],
                         "bias": sd[f"features.{i}.0.bias"]},
                "conv": {"kernel": conv_w(sd[f"features.{i}.1.weight"]),
                         "bias": sd[f"features.{i}.1.bias"]},
            }

    return jax.tree_util.tree_map(jnp.asarray, params)
