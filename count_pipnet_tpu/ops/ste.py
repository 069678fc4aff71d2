"""Straight-through estimators for the Count-PIPNet count head.

These are `jax.custom_vjp` re-derivations of the reference's
`torch.autograd.Function`s (reference: pipnet/count_pipnet_utils.py:41-321).
Everything is fully vectorized — no boolean gather/scatter — so the backward
passes compile to pure VPU element-wise code on TPU.

Semantics notes (verified empirically against the PyTorch reference):

* ``ste_round`` — round forward, identity backward
  (reference count_pipnet_utils.py:41-55).
* ``ste_clamp`` — clamp forward; backward either identity or gated by an
  in-range mask of the *input* (reference count_pipnet_utils.py:58-84).
* ``modified_onehot_ste`` — the "follow the minimum gradient" backward
  (reference count_pipnet_utils.py:188-321). Two behaviors of the reference
  implementation come from chained-advanced-indexing assignments that are
  silent no-ops in PyTorch, and we reproduce them exactly because that is
  what the reference actually trains with:

  1. zero-count entries NEVER receive a gradient (the intended behavior in
     the reference docstring — pass the bin-0 gradient when negative — is
     dead code at count_pipnet_utils.py:318);
  2. under ``positive_grad_strategy='max_grad'``, IF any nonzero-count entry
     in the batch has an all-positive gradient row (the batch-global gate at
     count_pipnet_utils.py:271), entries whose gradient row contains a
     negative value receive a ZERO gradient (the intended directional
     fallback at count_pipnet_utils.py:283-284 is dead code). When no such
     entry exists, the reference's working else-branch applies full
     directional logic.

  Set ``fixed_zero_grad=True`` to enable the documented/intended behavior
  instead (an opt-in extension, not used by default).
"""

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "ste_round",
    "ste_clamp",
    "create_modified_encoding",
    "modified_onehot_ste",
]


# ---------------------------------------------------------------------------
# STE round
# ---------------------------------------------------------------------------
@jax.custom_vjp
def ste_round(x):
    """Round to nearest integer; gradients pass through unchanged.

    Matches torch.round (banker's rounding — round-half-to-even), which is
    also jnp.round's behavior. Reference: count_pipnet_utils.py:41-55.
    """
    return jnp.round(x)


def _ste_round_fwd(x):
    return jnp.round(x), None


def _ste_round_bwd(_, g):
    return (g,)


ste_round.defvjp(_ste_round_fwd, _ste_round_bwd)


# ---------------------------------------------------------------------------
# STE clamp
# ---------------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def ste_clamp(x, min_val, max_val, backward_identity=True):
    """Clamp forward; backward identity or gated by the in-range mask.

    Reference: count_pipnet_utils.py:58-84 (``ClampSTE``). The gated variant
    multiplies the gradient by ``(x >= min_val) & (x <= max_val)`` where x is
    the *pre-clamp* input.
    """
    return jnp.clip(x, min_val, max_val)


def _ste_clamp_fwd(x, min_val, max_val, backward_identity):
    return jnp.clip(x, min_val, max_val), x


def _ste_clamp_bwd(min_val, max_val, backward_identity, x, g):
    if backward_identity:
        return (g,)
    mask = (x >= min_val) & (x <= max_val)
    return (g * mask.astype(g.dtype),)


ste_clamp.defvjp(_ste_clamp_fwd, _ste_clamp_bwd)


# ---------------------------------------------------------------------------
# Modified one-hot count encoding
# ---------------------------------------------------------------------------
def create_modified_encoding(x, max_count):
    """Encode counts as a modified one-hot: 0 -> all-zeros, k -> e_{k-1}.

    Args:
      x: [batch, num_prototypes] (rounded) counts.
      max_count: number of count bins.

    Returns:
      [batch, num_prototypes, max_count] float encoding. Counts above
      ``max_count`` map to the last bin; counts <= 0.1 map to all-zeros.

    Reference: count_pipnet_utils.py:141-185 (scatter-based; here a one_hot
    mask product which XLA fuses into a single select — no scatter needed).
    """
    nonzero = (x > 0.1).astype(jnp.float32)
    idx = jnp.clip(x.astype(jnp.int32) - 1, 0, max_count - 1)
    onehot = jax.nn.one_hot(idx, max_count, dtype=jnp.float32)
    return onehot * nonzero[..., None]


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def modified_onehot_ste(
    counts,
    max_count,
    respect_active_grad=False,
    positive_grad_strategy=None,
    fixed_zero_grad=False,
):
    """Modified one-hot encoding with the "follow the minimum gradient" STE.

    Forward: round counts, then :func:`create_modified_encoding`.
    Backward: for each (batch, prototype) the incoming gradient is a row of
    ``max_count`` values; the returned count-gradient pushes the count toward
    the bin with the most negative gradient (reference
    count_pipnet_utils.py:219-321; see module docstring for the two
    reproduced reference quirks).

    Args:
      counts: [batch, num_prototypes] raw (unrounded) counts.
      max_count: number of bins.
      respect_active_grad: zero the computed gradient where the gradient at
        the currently-active bin is already negative (stability gate).
      positive_grad_strategy: None | 'current_grad' | 'max_grad'.
      fixed_zero_grad: opt-in fix of the reference's dead code paths (see
        module docstring). Default False = bit-match the reference.

    Returns:
      [batch, num_prototypes, max_count] encoding (NOT flattened; the
      OneHotEncoder layer flattens, reference count_pipnet_utils.py:123).
    """
    return create_modified_encoding(jnp.round(counts), max_count)


def _monehot_fwd(counts, max_count, respect_active_grad,
                 positive_grad_strategy, fixed_zero_grad):
    rounded = jnp.round(counts)
    return create_modified_encoding(rounded, max_count), rounded


def _monehot_bwd(max_count, respect_active_grad, positive_grad_strategy,
                 fixed_zero_grad, rounded, g):
    # g: [batch, num_prototypes, max_count]
    g = g.astype(jnp.float32)
    cur = jnp.clip(rounded.astype(jnp.int32) - 1, 0, max_count - 1)
    zero_mask = rounded < 0.1

    min_val = jnp.min(g, axis=-1)
    min_idx = jnp.argmin(g, axis=-1)
    all_pos = min_val > 0.0

    g_cur = jnp.take_along_axis(g, cur[..., None], axis=-1)[..., 0]

    if positive_grad_strategy == "max_grad":
        max_val = jnp.max(g, axis=-1)
        if fixed_zero_grad:
            # Intended behavior: directional update for rows with negatives.
            mag = jnp.abs(min_val)
            directional = jnp.where(
                min_idx < cur, mag, jnp.where(min_idx > cur, -mag, 0.0)
            )
            grad_nz = jnp.where(all_pos, max_val, directional)
        else:
            # Reference actual behavior: the chained-indexing no-op (rows
            # with negatives get ZERO, dead code at
            # count_pipnet_utils.py:283-284) only fires when the
            # batch-global gate `torch.any(all_pos)` over NONZERO rows is
            # true (count_pipnet_utils.py:271); when no nonzero row is
            # all-positive, the working else-branch applies full
            # directional logic with magnitude |min|.
            any_ap = jnp.any(all_pos & ~zero_mask)
            mag = jnp.abs(min_val)
            directional = jnp.where(
                min_idx < cur, mag, jnp.where(min_idx > cur, -mag, 0.0)
            )
            grad_nz = jnp.where(
                any_ap, jnp.where(all_pos, max_val, 0.0), directional
            )
    else:
        mag = jnp.abs(min_val)
        if positive_grad_strategy == "current_grad":
            mag = jnp.where(all_pos, g_cur, mag)
        grad_nz = jnp.where(
            min_idx < cur, mag, jnp.where(min_idx > cur, -mag, 0.0)
        )

    if respect_active_grad:
        grad_nz = jnp.where(g_cur < 0.0, 0.0, grad_nz)

    if fixed_zero_grad:
        # Intended behavior: a zero count receives the (negative) bin-0
        # gradient so it can grow toward count 1.
        g0 = g[..., 0]
        zero_grad = jnp.where(g0 < 0.0, g0, 0.0)
    else:
        # Reference actual behavior: zero counts never receive gradient
        # (dead code at count_pipnet_utils.py:318).
        zero_grad = jnp.zeros_like(grad_nz)

    counts_grad = jnp.where(zero_mask, zero_grad, grad_nz)
    return (counts_grad,)


modified_onehot_ste.defvjp(_monehot_fwd, _monehot_bwd)
