from .ste import (
    ste_round,
    ste_clamp,
    create_modified_encoding,
    modified_onehot_ste,
)
from .gumbel import gumbel_softmax
from .losses import align_loss, tanh_loss, class_loss, calculate_loss

__all__ = [
    "ste_round",
    "ste_clamp",
    "create_modified_encoding",
    "modified_onehot_ste",
    "gumbel_softmax",
    "align_loss",
    "tanh_loss",
    "class_loss",
    "calculate_loss",
]
