"""Model construction and forward-pass invariants.

Mirrors the reference's backbone shape table (tests/test-convnext-backbone.py)
and CountPIPNet forward invariants (tests/test-count-pipnet.py, the
commented-out suite: counts == spatial sum of proto maps, inference returns
integral clamped counts, etc.). Uses small inputs to stay fast on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from count_pipnet_tpu.models import (
    convnext_tiny_26_features, convnext_tiny_13_features,
    get_count_network, get_pipnet, build_backbone,
)
from count_pipnet_tpu.models.pipnet import importance_per_class


class Args:
    """Minimal stand-in for the reference argparse namespace."""
    net = "convnext_tiny_26"
    num_features = 16
    use_mid_layers = True
    num_stages = 2
    bias = False
    activation = "gumbel_softmax"
    intermediate_layer = "onehot"
    positive_grad_strategy = None
    backward_clamp_strategy = "Identity"
    disable_pretrained = True


def init_and_run(model, x, inference=False, train=False):
    rngs = {"params": jax.random.PRNGKey(0),
            "gumbel": jax.random.PRNGKey(1),
            "droppath": jax.random.PRNGKey(2)}
    variables = model.init(rngs, x, inference=inference, train=train)
    out = model.apply(
        variables, x, inference=inference, train=train,
        rngs={"gumbel": jax.random.PRNGKey(3),
              "droppath": jax.random.PRNGKey(4)},
        mutable=["batch_stats"] if train else False,
    )
    if train:
        out = out[0]
    return variables, out


class TestConvNeXtShapes:
    def test_latent_grid_26_variant(self):
        # stride threshold 100: 64 -> 16 (stem) -> 8 (f2 s2) -> 7 -> 6
        m = convnext_tiny_26_features()
        x = jnp.zeros((1, 64, 64, 3))
        v = m.init({"params": jax.random.PRNGKey(0)}, x)
        y = m.apply(v, x)
        assert y.shape == (1, 6, 6, 768)

    def test_latent_grid_13_variant(self):
        # threshold 300: 64 -> 16 -> 8 -> 4 (f4 s2) -> 3
        m = convnext_tiny_13_features()
        x = jnp.zeros((1, 64, 64, 3))
        v = m.init({"params": jax.random.PRNGKey(0)}, x)
        y = m.apply(v, x)
        assert y.shape == (1, 3, 3, 768)

    @pytest.mark.parametrize("num_stages,channels", [
        (1, 96), (2, 192), (3, 192), (4, 384),
    ])
    def test_mid_layer_channels(self, num_stages, channels):
        # Channel table from the reference's backbone analysis script
        # (tests/test-convnext-backbone.py).
        m = convnext_tiny_26_features(num_stages=num_stages)
        assert m.out_channels == channels
        x = jnp.zeros((1, 32, 32, 3))
        v = m.init({"params": jax.random.PRNGKey(0)}, x)
        y = m.apply(v, x)
        assert y.shape[-1] == channels

    def test_param_naming_matches_grouping_contract(self):
        m = convnext_tiny_26_features(num_stages=3)
        x = jnp.zeros((1, 32, 32, 3))
        v = m.init({"params": jax.random.PRNGKey(0)}, x)
        names = set(v["params"].keys())
        assert "features_0" in names
        assert "features_2" in names          # downsample
        assert "features_3_block_0" in names  # block stage
        assert not any(n.startswith("features_4") for n in names)


class TestResNetShapes:
    def test_resnet18_stride_surgery(self):
        # layer3/4 at stride 1 -> /8 total: 64 -> 8x8, 512 ch
        m = build_backbone("resnet18")
        x = jnp.zeros((1, 64, 64, 3))
        v = m.init({"params": jax.random.PRNGKey(0)}, x)
        y = m.apply(v, x)
        assert y.shape == (1, 8, 8, 512)
        assert m.out_channels == 512

    def test_resnet50_channels(self):
        m = build_backbone("resnet50")
        assert m.out_channels == 2048


class TestCountPIPNet:
    def setup_method(self):
        self.args = Args()
        self.model, self.num_protos = get_count_network(
            num_classes=5, args=self.args, max_count=3, use_ste=True)
        assert self.num_protos == 16
        self.x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
        rngs = {"params": jax.random.PRNGKey(0),
                "gumbel": jax.random.PRNGKey(1)}
        self.variables = self.model.init(rngs, self.x)

    def _fwd(self, inference=False, train=False):
        return self.model.apply(
            self.variables, self.x, inference=inference, train=train,
            rngs={"gumbel": jax.random.PRNGKey(7),
                  "droppath": jax.random.PRNGKey(8)})

    def test_output_shapes(self):
        proto, pooled, out = self._fwd()
        assert proto.shape[0] == 2 and proto.shape[-1] == 16
        assert pooled.shape == (2, 16)
        assert out.shape == (2, 5)

    def test_counts_equal_spatial_sum_in_training(self):
        proto, pooled, _ = self._fwd(train=False, inference=False)
        np.testing.assert_allclose(
            pooled, jnp.sum(proto, axis=(1, 2)), rtol=1e-5)

    def test_inference_counts_are_integral_and_clamped(self):
        _, pooled, _ = self._fwd(inference=True)
        np.testing.assert_allclose(pooled, jnp.round(pooled), atol=1e-6)
        assert jnp.all(pooled >= 0) and jnp.all(pooled <= 3)

    def test_eval_gumbel_is_hard_onehot(self):
        proto, _, _ = self._fwd(train=False)
        # hard one-hot per patch: exactly one channel = 1
        sums = jnp.sum(proto, axis=-1)
        np.testing.assert_allclose(sums, jnp.ones_like(sums), atol=1e-6)
        maxes = jnp.max(proto, axis=-1)
        np.testing.assert_allclose(maxes, jnp.ones_like(maxes), atol=1e-6)

    def test_train_gumbel_is_soft_simplex(self):
        proto, _, _ = self._fwd(train=True)
        sums = jnp.sum(proto, axis=-1)
        np.testing.assert_allclose(sums, jnp.ones_like(sums), atol=1e-5)
        assert jnp.max(proto) < 1.0  # soft, not one-hot

    def test_importance_per_class_onehot(self):
        imp = importance_per_class(
            self.model.bind(self.variables), self.variables["params"])
        assert imp.shape == (5, 16)
        # For onehot, importance[c,p] = sum of |W[c, p*M:(p+1)*M]|
        w = self.variables["params"]["classification"]["weight"]
        expected = jnp.abs(
            jnp.ones((16, 48)) * 0  # placeholder, explicit below
        )
        blocks = w.reshape(5, 16, 3).sum(-1)
        np.testing.assert_allclose(imp, blocks, rtol=1e-5)

    def test_gradients_flow_to_backbone(self):
        def loss_fn(params):
            variables = {"params": params}
            proto, pooled, out = self.model.apply(
                variables, self.x, train=True,
                rngs={"gumbel": jax.random.PRNGKey(7),
                      "droppath": jax.random.PRNGKey(8)})
            return jnp.sum(out) + jnp.sum(proto)

        g = jax.grad(loss_fn)(self.variables["params"])
        leaf = g["backbone"]["features_0"]["conv"]["kernel"]
        assert jnp.any(leaf != 0)


class TestPIPNet:
    def setup_method(self):
        args = Args()
        args.num_features = 0
        self.model, self.num_protos = get_pipnet(num_classes=5, args=args)
        assert self.num_protos == 192  # backbone channels at num_stages=2
        self.x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
        self.variables = self.model.init(
            {"params": jax.random.PRNGKey(0)}, self.x)

    def test_pooled_is_max_in_01(self):
        proto, pooled, out = self.model.apply(self.variables, self.x)
        np.testing.assert_allclose(pooled, jnp.max(proto, axis=(1, 2)),
                                   rtol=1e-6)
        assert jnp.all(pooled >= 0) and jnp.all(pooled <= 1)

    def test_inference_abstention_clamp(self):
        _, pooled, _ = self.model.apply(self.variables, self.x,
                                        inference=True)
        assert jnp.all((pooled == 0) | (pooled >= 0.1))
