"""Pallas depthwise-conv wgrad vs XLA autodiff (training backward).

Validates ops/pallas/dwconv_bwd.py: the interpret-mode Pallas kernel,
the jnp fallback, and the custom-VJP wrapper must all reproduce
jax.vjp of the plain XLA depthwise conv (what flax nn.Conv trains
with) at training shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from count_pipnet_tpu.ops.pallas.dwconv_bwd import (
    _dw_conv, dwconv7_ad, dwconv7_wgrad,
)


def _ref_vjp(x, k, b, g, dtype):
    y, pull = jax.vjp(lambda xx, kk, bb: _dw_conv(xx, kk, bb, dtype),
                      x, k, b)
    return y, pull(g.astype(y.dtype))


SHAPES = [(3, 9, 9, 8), (2, 14, 13, 16)]


@pytest.mark.parametrize("shape", SHAPES)
def test_wgrad_interpret_matches_xla(shape):
    rng = np.random.default_rng(0)
    b, h, w, c = shape
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=(7, 7, 1, c)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    g = jnp.asarray(rng.normal(size=shape), jnp.float32)

    _, (dx_r, dk_r, db_r) = _ref_vjp(x, k, bias, g, jnp.float32)
    dk, db = dwconv7_wgrad(x, g, interpret=True)
    np.testing.assert_allclose(dk, dk_r, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(db, db_r, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_custom_vjp_matches_xla(dtype):
    rng = np.random.default_rng(1)
    shape = (4, 12, 11, 16)
    c = shape[-1]
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=(7, 7, 1, c)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    g = jnp.asarray(rng.normal(size=shape), jnp.float32)

    y_r, (dx_r, dk_r, db_r) = _ref_vjp(x, k, bias, g, dtype)
    y, pull = jax.vjp(
        lambda xx, kk, bb: dwconv7_ad(xx, kk, bb, dtype, False),
        x, k, bias)
    dx, dk, db = pull(g.astype(y.dtype))

    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_r, np.float32), rtol=1e-5)
    tol = 1e-4 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(dx, np.float32),
                               np.asarray(dx_r, np.float32),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(dk, np.float32),
                               np.asarray(dk_r, np.float32),
                               rtol=tol, atol=tol * np.abs(dk_r).max())
    np.testing.assert_allclose(np.asarray(db, np.float32),
                               np.asarray(db_r, np.float32),
                               rtol=tol, atol=tol * np.abs(db_r).max())


def test_grad_through_loss_scalar():
    """End-to-end: grad of a scalar loss agrees between the custom-VJP
    conv and the plain conv (float32, jnp fallback path)."""
    rng = np.random.default_rng(2)
    shape = (2, 10, 10, 8)
    c = shape[-1]
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=(7, 7, 1, c)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c,)), jnp.float32)

    def loss_custom(k_, b_):
        return jnp.sum(jnp.tanh(dwconv7_ad(x, k_, b_, jnp.float32,
                                           False)))

    def loss_ref(k_, b_):
        return jnp.sum(jnp.tanh(_dw_conv(x, k_, b_, jnp.float32)))

    gk, gb = jax.grad(loss_custom, argnums=(0, 1))(k, bias)
    gk_r, gb_r = jax.grad(loss_ref, argnums=(0, 1))(k, bias)
    np.testing.assert_allclose(gk, gk_r, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gb, gb_r, rtol=1e-4, atol=1e-5)


def test_pfwd_ad_matches_xla_vjp():
    """dwconv7_pfwd_ad (Pallas-forward wrapper): with use_pallas=False the
    forward is the same XLA op and every gradient must be bit-identical
    to jax.vjp of the plain conv; the interpret-mode Pallas forward must
    agree with the XLA forward numerically."""
    from count_pipnet_tpu.ops.pallas.dwconv import dwconv7
    from count_pipnet_tpu.ops.pallas.dwconv_bwd import dwconv7_pfwd_ad

    rng = np.random.default_rng(3)
    shape = (2, 12, 11, 16)
    c = shape[-1]
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=(7, 7, 1, c)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    g = jnp.asarray(rng.normal(size=shape), jnp.float32)

    y_r, (dx_r, dk_r, db_r) = _ref_vjp(x, k, bias, g, jnp.float32)
    y, pull = jax.vjp(
        lambda xx, kk, bb: dwconv7_pfwd_ad(xx, kk, bb, jnp.float32,
                                           False), x, k, bias)
    dx, dk, db = pull(g)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_r))
    np.testing.assert_allclose(dx, dx_r, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(dk, dk_r, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(db, db_r, rtol=1e-6, atol=1e-6)

    y_p = dwconv7(x, k, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_r),
                               rtol=1e-5, atol=1e-5)


def test_cnblock_fused_dwconv_parity():
    """CNBlock(fused_dwconv=True) on CPU (XLA-forward fallback): same
    param tree, same output, same grads as the standard nn.Conv path."""
    from count_pipnet_tpu.models.convnext import CNBlock

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 10, 10, 16)), jnp.float32)
    ref = CNBlock(16, fused_mlp=False, fused_dwconv=False)
    new = CNBlock(16, fused_mlp=False, fused_dwconv=True)
    params = ref.init(jax.random.PRNGKey(0), x)["params"]
    p2 = new.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(p2)

    def loss(module, p):
        return jnp.sum(jnp.tanh(module.apply({"params": p}, x)))

    l_r, g_r = jax.value_and_grad(lambda p: loss(ref, p))(params)
    l_n, g_n = jax.value_and_grad(lambda p: loss(new, p))(params)
    np.testing.assert_allclose(l_n, l_r, rtol=1e-6)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_r),
            jax.tree_util.tree_leaves_with_path(g_n)):
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6,
                                   err_msg=str(kp))
