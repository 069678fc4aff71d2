"""Gumbel-softmax with explicit PRNG keys (TPU-native RNG threading).

Reference: pipnet/count_pipnet_utils.py:7-38 (``GumbelSoftmax`` module, which
wraps ``torch.nn.functional.gumbel_softmax``): soft samples during training,
hard (straight-through one-hot) samples at eval. Note the reference samples
Gumbel noise at eval time too — eval is stochastic; we keep that behavior and
additionally expose a deterministic argmax path (``hard_deterministic``) used
by batched visualization/projection when reproducibility matters.
"""

import jax
import jax.numpy as jnp

__all__ = ["gumbel_softmax"]


def gumbel_softmax(key, logits, tau=1.0, hard=False, axis=-1):
    """Sample from the Gumbel-Softmax / Concrete distribution.

    Args:
      key: PRNG key (may be None only if you want plain softmax — not the
        reference behavior; pass a key).
      logits: unnormalized log-probs; softmax is taken over ``axis``.
      tau: temperature.
      hard: straight-through one-hot (forward hard, backward soft).
      axis: softmax axis.

    Returns:
      Tensor of the same shape as ``logits``.
    """
    gumbels = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    y_soft = jax.nn.softmax((logits.astype(jnp.float32) + gumbels) / tau, axis=axis)
    if not hard:
        return y_soft.astype(logits.dtype)
    index = jnp.argmax(y_soft, axis=axis)
    y_hard = jax.nn.one_hot(index, logits.shape[axis], axis=axis,
                            dtype=y_soft.dtype)
    # Straight-through: forward = hard, backward = soft.
    y = y_hard + y_soft - jax.lax.stop_gradient(y_soft)
    return y.astype(logits.dtype)


def hard_deterministic(logits, axis=-1):
    """Deterministic one-hot argmax (tau -> 0, no noise). Extension — the
    reference always injects Gumbel noise even at eval."""
    index = jnp.argmax(logits, axis=axis)
    return jax.nn.one_hot(index, logits.shape[axis], axis=axis,
                          dtype=logits.dtype)
