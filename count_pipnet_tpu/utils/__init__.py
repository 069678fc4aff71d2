from .log import Log, Tee
from .func import get_patch_size, topk_accuracy
from .checkpoint import CheckpointManager, load_backbone_only

__all__ = ["Log", "Tee", "get_patch_size", "topk_accuracy",
           "CheckpointManager", "load_backbone_only"]
