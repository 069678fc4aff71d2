from .optim import (
    label_params, adamw_init, adamw_update, cosine_lr, warm_restart_lr,
    NET_LABELS, CLASSIFIER_LABELS,
)

__all__ = [
    "label_params", "adamw_init", "adamw_update", "cosine_lr",
    "warm_restart_lr", "NET_LABELS", "CLASSIFIER_LABELS",
]
