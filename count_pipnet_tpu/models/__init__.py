from .pipnet import (
    PIPNet, CountPIPNet, get_pipnet, get_count_network, build_backbone,
    importance_per_class, BACKBONE_BUILDERS,
)
from .convnext import (
    ConvNeXtFeatures, convnext_tiny_26_features, convnext_tiny_13_features,
    convert_torchvision_convnext,
)
from .resnet import ResNetFeatures, convert_torch_resnet
from .heads import NonNegLinear, AddOn
from .intermediates import make_intermediate
from .virtual_weights import (
    estimate_mean_intermediate_features, calculate_virtual_weights,
)

__all__ = [
    "PIPNet", "CountPIPNet", "get_pipnet", "get_count_network",
    "build_backbone", "importance_per_class", "BACKBONE_BUILDERS",
    "ConvNeXtFeatures", "convnext_tiny_26_features",
    "convnext_tiny_13_features", "convert_torchvision_convnext",
    "ResNetFeatures", "convert_torch_resnet",
    "NonNegLinear", "AddOn", "make_intermediate",
    "estimate_mean_intermediate_features", "calculate_virtual_weights",
]
