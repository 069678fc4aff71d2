"""Prototype head building blocks: non-negative classifier and add-on layers.

Reference: pipnet/pipnet.py:54-108 and pipnet/count_pipnet.py:176-224,356-381.
"""

import math
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.gumbel import gumbel_softmax

__all__ = ["NonNegLinear", "AddOn"]


def _kaiming_uniform_a5(key, shape, dtype=jnp.float32):
    """torch kaiming_uniform_(a=sqrt(5)) on a [out, in] weight — the
    reference classifier's reset_parameters (count_pipnet.py:205-211).
    bound = sqrt(6 / ((1 + a^2) * fan_in)) = 1/sqrt(fan_in)."""
    fan_in = shape[1]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class NonNegLinear(nn.Module):
    """Linear layer applying relu to its weights so prototype presence can
    only add positive class evidence; carries the scalar
    ``normalization_multiplier`` parameter (fixed at 2.0 by the trainer and
    excluded from gradients, reference main.py:171-172, util/args.py:300-301).

    Weight layout is [out_features, in_features] (torch layout) to keep the
    checkpoint/converter story simple; the forward is x @ relu(W).T.
    Reference: pipnet/pipnet.py:54-71, count_pipnet.py:176-224.
    """

    in_features: int
    out_features: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", _kaiming_uniform_a5,
                       (self.out_features, self.in_features))
        # normalization_multiplier is a *parameter* for checkpoint parity but
        # is never trained (requires_grad=False in the reference).
        self.param("multiplier", nn.initializers.ones, (1,))
        y = x.astype(self.dtype) @ nn.relu(w).astype(self.dtype).T
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.out_features,))
            y = y + b.astype(self.dtype)
        return y


class AddOn(nn.Module):
    """Optional 1x1 conv (when num_features > 0) followed by a per-patch
    softmax or Gumbel-softmax over prototype channels (NHWC -> axis=-1).

    Reference: pipnet/pipnet.py:92-104 (softmax variant),
    count_pipnet.py:356-381 (gumbel variant + optional 1x1 conv). The Gumbel
    temperature ``tau`` is a call-time argument (runtime scalar — annealing
    never recompiles), and the noise key comes from the 'gumbel' RNG
    collection. Train mode -> soft samples; eval -> hard one-hot samples
    (count_pipnet_utils.py:23-38).
    """

    num_prototypes: int          # 0 = use backbone channels, no conv
    activation: str = "gumbel_softmax"   # or "softmax"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, *, tau=1.0, train: bool = True):
        h = features
        if self.num_prototypes > 0:
            h = nn.Conv(self.num_prototypes, (1, 1), use_bias=True,
                        dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name="conv1x1")(h)
        if self.activation == "softmax":
            return jax.nn.softmax(h.astype(jnp.float32), axis=-1).astype(
                self.dtype)
        key = self.make_rng("gumbel")
        return gumbel_softmax(key, h, tau=tau, hard=not train, axis=-1)
