"""Intermediate layers mapping clamped counts -> classifier input.

Reference: pipnet/count_pipnet_utils.py:86-538. Five variants with identical
capability: onehot (default, STE-backed), linear (per-prototype shared ramp),
linear_full (full matrix with structured init), bilinear, identity.

Each module also exposes ``classifier_input_weight_matrix(params)`` — a
vectorized [num_prototypes, classifier_input_dim] version of the reference's
per-index ``prototype_to_classifier_input_weights`` (used by virtual-weight
interpretability, reference count_pipnet.py:126-147) — so the whole virtual
classification matrix is one matmul on device instead of a Python loop.
"""

from typing import Optional

import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..ops.ste import create_modified_encoding, modified_onehot_ste

__all__ = [
    "OneHotIntermediate", "LinearIntermediate", "LinearFullIntermediate",
    "BilinearIntermediate", "IdentityIntermediate", "make_intermediate",
]


class OneHotIntermediate(nn.Module):
    """Counts -> modified one-hot (0 -> zeros, k -> e_{k-1}), flattened.

    Parameter-free. With ``use_ste``, the backward follows the minimum
    gradient (see ops/ste.py). Reference: count_pipnet_utils.py:86-139.
    """

    num_prototypes: int
    max_count: int
    use_ste: bool = True
    respect_active_grad: bool = False
    positive_grad_strategy: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        if self.use_ste:
            enc = modified_onehot_ste(
                x, self.max_count, self.respect_active_grad,
                self.positive_grad_strategy)
        else:
            enc = create_modified_encoding(x, self.max_count)
        return enc.reshape(enc.shape[0], -1)

    @property
    def output_dim(self):
        return self.num_prototypes * self.max_count

    def classifier_input_weight_matrix(self, params):
        # Block indicator: prototype p owns input dims [p*M, (p+1)*M).
        eye = jnp.eye(self.num_prototypes)
        return jnp.repeat(eye, self.max_count, axis=1)


class LinearIntermediate(nn.Module):
    """Per-prototype shared [1 -> max_count] ramp (weights shared across
    prototypes). Init: weight[i] = (i+1)/max_count.
    Reference: count_pipnet_utils.py:471-538."""

    num_prototypes: int
    max_count: int

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "ramp",
            lambda key: jnp.arange(1, self.max_count + 1, dtype=jnp.float32)
            / self.max_count,
        )
        # [B, P] x [M] -> [B, P, M] -> [B, P*M]
        expanded = x[:, :, None] * w[None, None, :]
        return expanded.reshape(x.shape[0], -1)

    @property
    def output_dim(self):
        return self.num_prototypes * self.max_count

    def classifier_input_weight_matrix(self, params):
        w = params["ramp"]
        eye = jnp.eye(self.num_prototypes)
        return jnp.repeat(eye, self.max_count, axis=1) * jnp.tile(
            w, self.num_prototypes)[None, :]


def _linear_full_init(num_prototypes, max_count):
    """Structured init: primary weight (c+1) on own prototype, weak
    0.1*(c+1)/P cross terms. Reference: count_pipnet_utils.py:409-427."""
    w = np.zeros((num_prototypes * max_count, num_prototypes),
                 dtype=np.float32)
    for p in range(num_prototypes):
        for c in range(max_count):
            idx = p * max_count + c
            w[idx, :] = 0.1 * (c + 1) / num_prototypes
            w[idx, p] = c + 1
    return jnp.asarray(w)


class LinearFullIntermediate(nn.Module):
    """Full [P -> P*M] linear map with structured init.
    Reference: count_pipnet_utils.py:387-444."""

    num_prototypes: int
    max_count: int

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            lambda key: _linear_full_init(self.num_prototypes,
                                          self.max_count),
        )  # [P*M, P] (torch layout [out, in] kept for converter parity)
        return x @ w.T

    @property
    def output_dim(self):
        return self.num_prototypes * self.max_count

    def classifier_input_weight_matrix(self, params):
        return params["weight"].T  # [P, P*M]


def _bilinear_embed_init(num_prototypes, max_count):
    """Each prototype maps to max_count consecutive dims scaled by count
    value. Reference: count_pipnet_utils.py:349-358."""
    w = np.zeros((num_prototypes * max_count, num_prototypes),
                 dtype=np.float32)
    for p in range(num_prototypes):
        for c in range(max_count):
            w[p * max_count + c, p] = c + 1
    return jnp.asarray(w)


def _torch_linear_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default weight init in flax [in, out] layout:
    kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    flax's default (lecun_normal, var 1/fan_in) has 3x the variance of
    torch's (var 1/(3*fan_in)); on the bilinear product W(e)*V(e) that
    compounds to ~9x the output variance at init — measured as the
    likely source of the bilinear variant's cross-seed instability
    (ACCURACY.md round 4). Parity target: torch Linear.reset_parameters
    via reference count_pipnet_utils.py:346-348 (custom_init=False)."""
    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    import jax
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class BilinearIntermediate(nn.Module):
    """embed -> W(e) * V(e) elementwise product.
    Reference: count_pipnet_utils.py:323-385 (custom_init=False default:
    W and V use torch nn.Linear default init — see _torch_linear_init).

    Attribution note: the reference's BilinearIntermediate lacks
    ``prototype_to_classifier_input_weights`` entirely, so the reference
    CRASHES (AttributeError at test.py:55) on any bilinear eval — its
    bilinear configs cannot complete a training run. Here the attribution
    is implemented exactly: for a unit count of prototype p alone
    (x = 1_p), the bilinear output is (W e_p) * (V e_p) with
    e_p = embed[:, p] — that output direction IS the prototype's
    influence on the classifier input."""

    num_prototypes: int
    max_count: int

    @nn.compact
    def __call__(self, x):
        d = self.num_prototypes * self.max_count
        embed_w = self.param(
            "embed",
            lambda key: _bilinear_embed_init(self.num_prototypes,
                                             self.max_count),
        )  # [D, P]
        e = x @ embed_w.T
        w = nn.Dense(d, use_bias=False, name="W",
                     kernel_init=_torch_linear_init)(e)
        v = nn.Dense(d, use_bias=False, name="V",
                     kernel_init=_torch_linear_init)(e)
        return w * v

    @property
    def output_dim(self):
        return self.num_prototypes * self.max_count

    def classifier_input_weight_matrix(self, params):
        """[P, D] exact unit-count attribution: row p = W(e_p) * V(e_p)
        (see class docstring; fixes the reference's bilinear eval crash)."""
        embed_w = params["embed"]           # [D, P]
        wk = params["W"]["kernel"]          # [D, D] (in, out)
        vk = params["V"]["kernel"]
        e = embed_w.T                       # [P, D]: e_p rows
        return (e @ wk) * (e @ vk)


class IdentityIntermediate(nn.Module):
    """Pass-through; classifier input dim = num_prototypes.
    Reference: count_pipnet_utils.py:446-469."""

    num_prototypes: int
    max_count: int = 0  # unused

    @nn.compact
    def __call__(self, x):
        return x

    @property
    def output_dim(self):
        return self.num_prototypes

    def classifier_input_weight_matrix(self, params):
        return jnp.eye(self.num_prototypes)


_INTERMEDIATES = {
    "onehot": OneHotIntermediate,
    "linear": LinearIntermediate,
    "linear_full": LinearFullIntermediate,
    "bilinear": BilinearIntermediate,
    "identity": IdentityIntermediate,
}


def make_intermediate(kind: str, num_prototypes: int, max_count: int,
                      use_ste: bool = True,
                      positive_grad_strategy: Optional[str] = None,
                      respect_active_grad: bool = False):
    """Factory mirroring the reference's intermediate-layer dispatch
    (reference count_pipnet.py:392-417)."""
    if kind not in _INTERMEDIATES:
        raise ValueError(
            f"Unknown intermediate layer type: {kind} "
            f"(choose from {sorted(_INTERMEDIATES)})")
    if kind == "onehot":
        return OneHotIntermediate(
            num_prototypes=num_prototypes, max_count=max_count,
            use_ste=use_ste, respect_active_grad=respect_active_grad,
            positive_grad_strategy=positive_grad_strategy)
    return _INTERMEDIATES[kind](num_prototypes=num_prototypes,
                                max_count=max_count)
