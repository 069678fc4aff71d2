"""Virtual-weight machinery and feature-dimension helper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from count_pipnet_tpu.models import get_count_network
from count_pipnet_tpu.models.convnext import get_feature_dimensions
from count_pipnet_tpu.models.virtual_weights import (
    estimate_mean_intermediate_features, calculate_virtual_weights,
)
from count_pipnet_tpu.ops.losses import uniform_loss


class Args:
    net = "convnext_tiny_26"
    num_features = 4
    use_mid_layers = True
    num_stages = 1
    bias = False
    activation = "softmax"
    intermediate_layer = "onehot"
    positive_grad_strategy = None
    backward_clamp_strategy = "Identity"
    disable_pretrained = True


class FakeLoader:
    """Yields two fixed (xs, ys) batches of NHWC arrays."""

    def __init__(self, n=6, img=32):
        rng = np.random.default_rng(0)
        self.batches = [
            (rng.normal(size=(3, img, img, 3)).astype(np.float32),
             np.array([0, 1, 2])) for _ in range(2)]

    def __iter__(self):
        return iter(self.batches)


@pytest.fixture(scope="module")
def model_and_params():
    model, _ = get_count_network(3, Args, max_count=3, use_ste=True)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    return model, params


class TestVirtualWeights:
    def test_mean_intermediate_features_shape(self, model_and_params):
        model, params = model_and_params
        means = estimate_mean_intermediate_features(
            model, params, {}, FakeLoader(), batch=4)
        assert means.shape == (4 * 3,)  # P * max_count
        assert np.all(np.isfinite(means))
        assert means.min() >= 0 and means.max() <= 1  # onehot averages

    def test_calculate_virtual_weights_plain(self, model_and_params):
        model, params = model_and_params
        vw = calculate_virtual_weights(model, params, {})
        assert vw.shape == (3, 4)
        # onehot: block sums of classifier weight
        w = params["classification"]["weight"].reshape(3, 4, 3).sum(-1)
        np.testing.assert_allclose(np.asarray(vw), np.asarray(w),
                                   rtol=1e-4, atol=1e-5)

    def test_custom_onehot_scale_changes_weights(self, model_and_params):
        model, params = model_and_params
        plain = calculate_virtual_weights(model, params, {})
        scaled = calculate_virtual_weights(
            model, params, {}, FakeLoader(), custom_onehot_scale=True)
        assert scaled.shape == plain.shape
        assert not np.allclose(np.asarray(scaled), np.asarray(plain))

    def test_requires_loader_for_scaling(self, model_and_params):
        model, params = model_and_params
        with pytest.raises(ValueError):
            calculate_virtual_weights(model, params, {},
                                      custom_onehot_scale=True)


class TestFeatureDimensions:
    @pytest.mark.parametrize("stages,img,expected", [
        (7, 224, (1, 26, 26, 768)),   # the "26x26" variant contract
        (3, 192, (1, 24, 24, 192)),   # shapes config
        (1, 64, (1, 16, 16, 96)),
        (2, 64, (1, 8, 8, 192)),
    ])
    def test_closed_form(self, stages, img, expected):
        got = get_feature_dimensions(use_mid_layers=stages < 7,
                                     num_stages=stages, input_size=img)
        assert got == expected

    def test_13_variant(self):
        got = get_feature_dimensions(input_size=224, stride_threshold=300)
        assert got == (1, 13, 13, 768)


class TestUniformLoss:
    def test_uniform_points_lower_loss(self):
        # spread-out unit vectors score lower than collapsed ones
        spread = jnp.eye(4)
        collapsed = jnp.ones((4, 4)) / 2.0
        assert float(uniform_loss(spread)) < float(uniform_loss(collapsed))

    def test_torch_reference_formula(self):
        torch = pytest.importorskip("torch")
        x = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
        tx = torch.tensor(x)
        ref = (torch.pdist(tx, p=2).pow(2).mul(-2).exp().mean()
               + 1e-10).log().item()
        got = float(uniform_loss(jnp.asarray(x)))
        assert got == pytest.approx(ref, rel=1e-4)


class TestBilinearAttribution:
    def test_unit_count_exactness(self):
        """Bilinear attribution row p equals the layer's output for a
        unit count of prototype p (fixes the reference's bilinear eval
        crash — its BilinearIntermediate lacks the method entirely,
        count_pipnet_utils.py:323-385 vs test.py:55)."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from count_pipnet_tpu.models.intermediates import make_intermediate

        m = make_intermediate("bilinear", num_prototypes=5, max_count=2)
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 5)))["params"]
        attr = m.classifier_input_weight_matrix(params)
        assert attr.shape == (5, 10)
        for p in range(5):
            onehot = jnp.zeros((1, 5)).at[0, p].set(1.0)
            out = m.apply({"params": params}, onehot)[0]
            np.testing.assert_allclose(np.asarray(out),
                                       np.asarray(attr[p]),
                                       rtol=1e-5, atol=1e-6)
