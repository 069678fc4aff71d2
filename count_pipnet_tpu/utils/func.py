"""Small helpers: latent->pixel patch geometry and top-k accuracy.

Reference: util/func.py.
"""

import numpy as np

__all__ = ["get_patch_size", "topk_accuracy"]


def get_patch_size(image_size: int, wshape: int, patchsize: int = 32):
    """Patch size and stride of the latent grid in pixel space
    (reference util/func.py:3-15): patch = 32, skip = round((image_size -
    patch) / (wshape - 1))."""
    skip = round((image_size - patchsize) / (wshape - 1))
    return patchsize, skip


def topk_accuracy(out, targets, topk=(1,)):
    """Per-example top-k correctness, with k capped at num_classes
    (reference util/func.py:22-37). numpy implementation for host-side
    metric plumbing; the jitted eval step computes this on device."""
    out = np.asarray(out)
    targets = np.asarray(targets)
    num_classes = out.shape[1]
    res = []
    order = np.argsort(-out, axis=1)
    for k in topk:
        kk = min(k, num_classes)
        correct = (order[:, :kk] == targets[:, None]).any(axis=1)
        res.append(correct.astype(np.float32))
    return res
