"""Fused Pallas count-head kernel vs its XLA reference, and the serving
fast path vs the standard model forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from count_pipnet_tpu.ops.pallas.fused_head import (
    fused_count_head, fused_count_head_reference,
)


class TestFusedCountHead:
    @pytest.mark.parametrize("hw,c,p", [(6, 128, 128), (22, 128, 256)])
    def test_matches_reference(self, hw, c, p):
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.normal(size=(2, hw, hw, c))
                            .astype(np.float32))
        w = jnp.asarray(rng.normal(size=(c, p)).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.normal(size=(p,)).astype(np.float32) * 0.1)
        ref = fused_count_head_reference(feats, w, b)
        got = fused_count_head(feats, w, b, tile_hw=128, interpret=True)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_counts_sum_to_num_patches(self):
        # softmax rows sum to 1 -> total counts = H*W
        rng = np.random.default_rng(1)
        feats = jnp.asarray(rng.normal(size=(1, 5, 5, 128))
                            .astype(np.float32))
        w = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32))
        b = jnp.zeros((128,), jnp.float32)
        counts = fused_count_head(feats, w, b, tile_hw=128, interpret=True)
        assert float(counts.sum()) == pytest.approx(25.0, rel=1e-4)


class TestServingPath:
    def test_matches_standard_forward(self):
        from count_pipnet_tpu.models import get_count_network
        from count_pipnet_tpu.models.serving import make_serving_fn

        class Args:
            net = "convnext_tiny_26"
            num_features = 8
            use_mid_layers = True
            num_stages = 1
            bias = False
            activation = "softmax"
            intermediate_layer = "onehot"
            positive_grad_strategy = None
            backward_clamp_strategy = "Identity"
            disable_pretrained = True

        model, _ = get_count_network(3, Args, max_count=3, use_ste=True)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
        params = model.init({"params": jax.random.PRNGKey(1)}, x)["params"]

        _, pooled_ref, out_ref = model.apply(
            {"params": params}, x, inference=True, train=False)

        serve = make_serving_fn(model, use_pallas=True, interpret=True)
        counts, out = serve(params, x)
        np.testing.assert_allclose(counts, pooled_ref, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(out, out_ref, rtol=1e-3, atol=1e-4)

    def test_gumbel_rejected(self):
        from count_pipnet_tpu.models import get_count_network
        from count_pipnet_tpu.models.serving import make_serving_fn

        class Args:
            net = "convnext_tiny_26"
            num_features = 8
            use_mid_layers = True
            num_stages = 1
            bias = False
            activation = "gumbel_softmax"
            intermediate_layer = "onehot"
            positive_grad_strategy = None
            backward_clamp_strategy = "Identity"
            disable_pretrained = True

        model, _ = get_count_network(3, Args, max_count=3, use_ste=True)
        with pytest.raises(ValueError):
            make_serving_fn(model)
