"""PIP-Net and Count-PIPNet model definitions (flax/linen, NHWC).

Reference behavior contract:
* PIPNet.forward: backbone -> add-on softmax -> spatial max-pool -> NonNeg
  classifier; at inference pooled activations < 0.1 are zeroed (abstention,
  reference pipnet/pipnet.py:31-41).
* CountPIPNet.forward: backbone -> add-on (gumbel/softmax) -> spatial SUM
  (counts) -> STE round + STE clamp to [0, max_count] (or plain round/clamp
  without STE) -> intermediate layer -> NonNeg classifier; training returns
  raw counts (for the tanh loss), inference returns clamped counts
  (reference pipnet/count_pipnet.py:70-110).

Outputs are ``(proto_features, pooled, out)`` with proto_features in NHWC
([B, H, W, P]) — the TPU-native layout.
"""

from typing import Any, Optional


import jax.numpy as jnp
import flax.linen as nn

from .convnext import (
    convnext_tiny_26_features, convnext_tiny_13_features, ConvNeXtFeatures,
)
from .resnet import (
    resnet18_features, resnet34_features, resnet50_features,
    resnet50_features_inat, resnet101_features, resnet152_features,
)
from .heads import NonNegLinear, AddOn
from .intermediates import make_intermediate

__all__ = [
    "PIPNet", "CountPIPNet", "get_pipnet", "get_count_network",
    "build_backbone", "BACKBONE_BUILDERS",
]


BACKBONE_BUILDERS = {
    "convnext_tiny_26": convnext_tiny_26_features,
    "convnext_tiny_13": convnext_tiny_13_features,
    "resnet18": resnet18_features,
    "resnet34": resnet34_features,
    "resnet50": resnet50_features,
    "resnet50_inat": resnet50_features_inat,
    "resnet101": resnet101_features,
    "resnet152": resnet152_features,
}


def build_backbone(net: str, use_mid_layers: bool = False,
                   num_stages: int = 2, dtype=jnp.float32,
                   fused_mlp: bool = False,
                   fused_whole_block: bool = False,
                   fused_dwconv: bool = False):
    """Backbone factory mirroring the reference's architecture dicts
    (pipnet/pipnet.py:44-51, count_pipnet.py:171-174)."""
    if net not in BACKBONE_BUILDERS:
        raise ValueError(
            f"Network '{net}' is not supported. Supported: "
            f"{sorted(BACKBONE_BUILDERS)}")
    if net.startswith("convnext"):
        stages = num_stages if use_mid_layers else 7
        return BACKBONE_BUILDERS[net](num_stages=stages, dtype=dtype,
                                      fused_mlp=fused_mlp,
                                      fused_whole_block=fused_whole_block,
                                      fused_dwconv=fused_dwconv)
    return BACKBONE_BUILDERS[net](dtype=dtype)


class PIPNet(nn.Module):
    """Original PIP-Net: softmax add-on + spatial max pool."""

    num_classes: int
    num_prototypes: int
    backbone: nn.Module
    num_features: int = 0  # >0 adds the 1x1 conv in the add-on
    bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, *, inference: bool = False, train: bool = False,
                 tau: float = 1.0):
        features = self.backbone(xs, deterministic=not train)
        proto_features = AddOn(
            num_prototypes=self.num_features, activation="softmax",
            dtype=self.dtype, name="add_on",
        )(features, train=train)
        pooled = jnp.max(proto_features, axis=(1, 2))
        clf = NonNegLinear(self.num_prototypes, self.num_classes,
                           use_bias=self.bias, dtype=self.dtype,
                           name="classification")
        if inference:
            # Abstention: ignore prototypes with <=0.1 similarity
            # (reference pipnet.py:36).
            clamped = jnp.where(pooled < 0.1, 0.0, pooled)
            out = clf(clamped)
            return proto_features, clamped, out
        out = clf(pooled)
        return proto_features, pooled, out


class CountPIPNet(nn.Module):
    """Count-aware PIP-Net: spatial sum -> count discretization ->
    intermediate expansion -> non-negative classifier."""

    num_classes: int
    num_prototypes: int
    backbone: nn.Module
    max_count: int = 3
    use_ste: bool = True
    backward_clamp_identity: bool = True   # 'Identity' vs 'Gated'
    activation: str = "gumbel_softmax"
    intermediate_type: str = "onehot"
    positive_grad_strategy: Optional[str] = None
    num_features: int = 0
    bias: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.add_on = AddOn(num_prototypes=self.num_features,
                            activation=self.activation, dtype=self.dtype)
        self.intermediate = make_intermediate(
            self.intermediate_type, self.num_prototypes, self.max_count,
            use_ste=self.use_ste,
            positive_grad_strategy=self.positive_grad_strategy)
        self.classification = NonNegLinear(
            self.intermediate.output_dim, self.num_classes,
            use_bias=self.bias, dtype=self.dtype)

    def __call__(self, xs, *, inference: bool = False, train: bool = False,
                 tau: float = 1.0):
        features = self.backbone(xs, deterministic=not train)
        proto_features = self.add_on(features, tau=tau, train=train)
        # Spatial sum = prototype occurrence count (count_pipnet.py:88).
        counts = jnp.sum(proto_features.astype(jnp.float32), axis=(1, 2))

        from ..ops.ste import ste_round, ste_clamp
        if self.use_ste:
            rounded = ste_round(counts)
            clamped = ste_clamp(rounded, 0.0, float(self.max_count),
                                self.backward_clamp_identity)
        else:
            rounded = jnp.round(counts) if inference else counts
            clamped = jnp.clip(rounded, 0.0, float(self.max_count))

        inter = self.intermediate(clamped)
        out = self.classification(inter)

        pooled = clamped if inference else counts
        return proto_features, pooled, out

    def classifier_input_weight_matrix(self, params):
        """Vectorized prototype->classifier-input attribution
        ([P, D]); see intermediates.py."""
        return self.intermediate.classifier_input_weight_matrix(
            params["intermediate"] if "intermediate" in params else {})


def importance_per_class(model: CountPIPNet, params,
                         classifier_input_scalars=None):
    """Virtual [num_classes, num_prototypes] importance matrix.

    importance[c, p] = sum_d |attribution[p, d] * scalar[d]| * W[c, d]
    — the vectorized form of the reference's per-prototype loop
    (count_pipnet.py:126-147, 283-321).
    """
    attribution = model.intermediate.classifier_input_weight_matrix(
        params.get("intermediate", {}))
    if classifier_input_scalars is not None:
        attribution = attribution * classifier_input_scalars[None, :]
    attribution = jnp.abs(attribution)
    w = params["classification"]["weight"]  # [C, D]
    # Interpretability math should be exact — force full-precision matmul
    # (the compute path keeps the fast default for TPU).
    return jnp.dot(w, attribution.T, precision="highest")  # [C, P]


def _infer_num_prototypes(net, args, backbone):
    num_features = getattr(args, "num_features", 0)
    if num_features and num_features > 0:
        return num_features
    return backbone.out_channels


def get_pipnet(num_classes: int, args, dtype=jnp.float32):
    """PIPNet factory (reference pipnet/pipnet.py:74-140).

    Returns (model, num_prototypes). Parameters are created lazily via
    ``model.init``; see train.state.init_model.
    """
    backbone = build_backbone(
        args.net, use_mid_layers=getattr(args, "use_mid_layers", False),
        num_stages=getattr(args, "num_stages", 2), dtype=dtype,
        fused_mlp=getattr(args, "fused_blocks", False),
        fused_whole_block=getattr(args, "fused_whole_blocks", False),
        fused_dwconv=getattr(args, "fused_dwconv", False))
    num_prototypes = _infer_num_prototypes(args.net, args, backbone)
    model = PIPNet(
        num_classes=num_classes, num_prototypes=num_prototypes,
        backbone=backbone, num_features=getattr(args, "num_features", 0),
        bias=getattr(args, "bias", False), dtype=dtype)
    return model, num_prototypes


def get_count_network(num_classes: int, args, max_count: int = 3,
                      use_ste: bool = True, dtype=jnp.float32):
    """CountPIPNet factory (reference pipnet/count_pipnet.py:324-436).

    ConvNeXt-only, like the reference (count_pipnet.py:339-341).
    Returns (model, num_prototypes).
    """
    if not args.net.startswith("convnext"):
        supported = [k for k in BACKBONE_BUILDERS if "convnext" in k]
        raise ValueError(
            f"Network '{args.net}' is not supported. Supported networks: "
            f"{supported}")
    backbone = build_backbone(
        args.net, use_mid_layers=getattr(args, "use_mid_layers", False),
        num_stages=getattr(args, "num_stages", 2), dtype=dtype,
        fused_mlp=getattr(args, "fused_blocks", False),
        fused_whole_block=getattr(args, "fused_whole_blocks", False),
        fused_dwconv=getattr(args, "fused_dwconv", False))
    num_prototypes = _infer_num_prototypes(args.net, args, backbone)
    model = CountPIPNet(
        num_classes=num_classes, num_prototypes=num_prototypes,
        backbone=backbone, max_count=max_count, use_ste=use_ste,
        backward_clamp_identity=(
            getattr(args, "backward_clamp_strategy", "Gated") == "Identity"),
        activation=getattr(args, "activation", "gumbel_softmax"),
        intermediate_type=getattr(args, "intermediate_layer", "onehot"),
        positive_grad_strategy=getattr(args, "positive_grad_strategy", None),
        num_features=getattr(args, "num_features", 0),
        bias=getattr(args, "bias", False), dtype=dtype)
    return model, num_prototypes
