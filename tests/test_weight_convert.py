"""Weight converters: torch-layout state dicts -> flax param trees.

torchvision isn't present in this environment, so these tests build
synthetic state_dicts with torchvision's exact naming/shapes and assert the
converted tree drops into our models (same structure, same shapes, loadable
by apply) and that layout transposes are correct.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from count_pipnet_tpu.models import (
    convnext_tiny_26_features, convert_torchvision_convnext,
)
from count_pipnet_tpu.models.resnet import (
    resnet18_features, convert_torch_resnet,
)


def synth_convnext_tiny_state_dict(rng):
    """torchvision convnext_tiny state_dict shapes/names."""
    sd = {}
    dims = [96, 192, 384, 768]
    blocks = [3, 3, 9, 3]

    def t(*shape):
        return rng.normal(size=shape).astype(np.float32)

    sd["features.0.0.weight"] = t(96, 3, 4, 4)
    sd["features.0.0.bias"] = t(96)
    sd["features.0.1.weight"] = t(96)
    sd["features.0.1.bias"] = t(96)
    for k in range(4):
        i = 2 * k + 1
        d = dims[k]
        for j in range(blocks[k]):
            pre = f"features.{i}.{j}"
            sd[f"{pre}.layer_scale"] = t(d, 1, 1)
            sd[f"{pre}.block.0.weight"] = t(d, 1, 7, 7)
            sd[f"{pre}.block.0.bias"] = t(d)
            sd[f"{pre}.block.2.weight"] = t(d)
            sd[f"{pre}.block.2.bias"] = t(d)
            sd[f"{pre}.block.3.weight"] = t(4 * d, d)
            sd[f"{pre}.block.3.bias"] = t(4 * d)
            sd[f"{pre}.block.5.weight"] = t(d, 4 * d)
            sd[f"{pre}.block.5.bias"] = t(d)
        if k < 3:
            i = 2 * k + 2
            sd[f"features.{i}.0.weight"] = t(dims[k])
            sd[f"features.{i}.0.bias"] = t(dims[k])
            sd[f"features.{i}.1.weight"] = t(dims[k + 1], dims[k], 2, 2)
            sd[f"features.{i}.1.bias"] = t(dims[k + 1])
    return sd


class TestConvNeXtConverter:
    def test_full_network_structure_and_shapes(self):
        rng = np.random.default_rng(0)
        sd = synth_convnext_tiny_state_dict(rng)
        converted = convert_torchvision_convnext(sd, num_stages=7)

        model = convnext_tiny_26_features()
        x = jnp.zeros((1, 64, 64, 3))
        init_params = model.init({"params": jax.random.PRNGKey(0)},
                                 x)["params"]

        init_shapes = jax.tree_util.tree_map(jnp.shape, init_params)
        conv_shapes = jax.tree_util.tree_map(jnp.shape, converted)
        assert init_shapes == conv_shapes

        # converted weights actually run
        y = model.apply({"params": converted}, x)
        assert y.shape == (1, 6, 6, 768)
        assert jnp.all(jnp.isfinite(y))

    def test_layout_transposes(self):
        rng = np.random.default_rng(1)
        sd = synth_convnext_tiny_state_dict(rng)
        converted = convert_torchvision_convnext(sd, num_stages=7)
        # conv: torch [out,in,kh,kw] -> flax [kh,kw,in,out]
        np.testing.assert_allclose(
            converted["features_0"]["conv"]["kernel"][2, 3, 1, 5],
            sd["features.0.0.weight"][5, 1, 2, 3])
        # dense: torch [out,in] -> [in,out]
        np.testing.assert_allclose(
            converted["features_1_block_0"]["pw1"]["kernel"][7, 11],
            sd["features.1.0.block.3.weight"][11, 7])
        # layer_scale [d,1,1] -> [d]
        np.testing.assert_allclose(
            converted["features_1_block_0"]["layer_scale"],
            sd["features.1.0.layer_scale"].reshape(-1))

    def test_mid_layer_truncation(self):
        rng = np.random.default_rng(2)
        sd = synth_convnext_tiny_state_dict(rng)
        converted = convert_torchvision_convnext(sd, num_stages=3)
        assert "features_3_block_0" in converted
        assert not any(k.startswith("features_4") for k in converted)

        model = convnext_tiny_26_features(num_stages=3)
        x = jnp.zeros((1, 32, 32, 3))
        init_params = model.init({"params": jax.random.PRNGKey(0)},
                                 x)["params"]
        assert (jax.tree_util.tree_map(jnp.shape, init_params)
                == jax.tree_util.tree_map(jnp.shape, converted))


def synth_resnet18_state_dict(rng):
    sd = {}

    def t(*shape):
        return rng.normal(size=shape).astype(np.float32)

    def add_bn(pre, c):
        sd[f"{pre}.weight"] = t(c)
        sd[f"{pre}.bias"] = t(c)
        sd[f"{pre}.running_mean"] = t(c)
        sd[f"{pre}.running_var"] = np.abs(t(c)) + 0.5

    sd["conv1.weight"] = t(64, 3, 7, 7)
    add_bn("bn1", 64)
    inplanes = 64
    for li, (planes, n) in enumerate(
            zip((64, 128, 256, 512), (2, 2, 2, 2)), start=1):
        for b in range(n):
            pre = f"layer{li}.{b}"
            stride_in = inplanes if b == 0 else planes
            sd[f"{pre}.conv1.weight"] = t(planes, stride_in, 3, 3)
            add_bn(f"{pre}.bn1", planes)
            sd[f"{pre}.conv2.weight"] = t(planes, planes, 3, 3)
            add_bn(f"{pre}.bn2", planes)
            if b == 0 and inplanes != planes:
                sd[f"{pre}.downsample.0.weight"] = t(planes, inplanes, 1, 1)
                add_bn(f"{pre}.downsample.1", planes)
        inplanes = planes
    sd["fc.weight"] = t(1000, 512)
    sd["fc.bias"] = t(1000)
    return sd


class TestResNetConverter:
    def test_resnet18_structure(self):
        rng = np.random.default_rng(3)
        sd = synth_resnet18_state_dict(rng)
        params, stats = convert_torch_resnet(sd, (2, 2, 2, 2),
                                             bottleneck=False)
        model = resnet18_features()
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init({"params": jax.random.PRNGKey(0)}, x)
        # Note: our resnet has layer2-4 stride quirks but identical params.
        assert (jax.tree_util.tree_map(jnp.shape, variables["params"])
                == jax.tree_util.tree_map(jnp.shape, params))
        assert (jax.tree_util.tree_map(jnp.shape,
                                       variables["batch_stats"])
                == jax.tree_util.tree_map(jnp.shape, stats))
        y = model.apply({"params": params, "batch_stats": stats}, x)
        assert y.shape == (1, 8, 8, 512)
        assert jnp.all(jnp.isfinite(y))

    def test_fc_keys_ignored(self):
        rng = np.random.default_rng(4)
        sd = synth_resnet18_state_dict(rng)
        params, _ = convert_torch_resnet(sd, (2, 2, 2, 2), bottleneck=False)
        flat = jax.tree_util.tree_leaves(params)
        assert all(l.shape != (1000, 512) for l in flat)


class TestValidationKitChecks:
    """The converter-validation script's in-env checks
    (scripts/validate_pretrained.py): the sentinel round-trip and the
    independent direct-from-state-dict forward that catches same-shape
    permutation miswiring no accounting check can see."""

    def _script_mod(self):
        import importlib.util
        import os
        path = os.path.join(os.path.dirname(__file__), "..",
                            "scripts", "validate_pretrained.py")
        spec = importlib.util.spec_from_file_location("_vp", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    @staticmethod
    def _truncated3(k):
        parts = k.split(".")
        return (parts[0] == "features" and parts[1].isdigit()
                and int(parts[1]) not in {0, 1, 2, 3})

    def test_sentinel_roundtrip_ok(self):
        V = self._script_mod()
        sd = synth_convnext_tiny_state_dict(np.random.default_rng(0))
        assert V.check_sentinel_roundtrip(
            lambda s: convert_torchvision_convnext(s, num_stages=3), sd,
            extra_skip=self._truncated3)

    def test_sentinel_roundtrip_catches_dropped_tensor(self):
        V = self._script_mod()
        sd = synth_convnext_tiny_state_dict(np.random.default_rng(0))

        def dropping_convert(s):
            p = convert_torchvision_convnext(s, num_stages=3)
            # simulated bug: one bias replaced by zeros (source dropped)
            p["features_1_block_0"]["dwconv"]["bias"] = jnp.zeros_like(
                p["features_1_block_0"]["dwconv"]["bias"])
            return p

        assert not V.check_sentinel_roundtrip(
            dropping_convert, sd, extra_skip=self._truncated3)

    def test_independent_forward_matches_converted(self):
        V = self._script_mod()
        sd = synth_convnext_tiny_state_dict(np.random.default_rng(1))
        p = convert_torchvision_convnext(sd, num_stages=3)
        model = convnext_tiny_26_features(num_stages=3)
        x = np.random.default_rng(2).normal(
            size=(1, 64, 64, 3)).astype(np.float32)
        ours = V.forward_ours(model, p, None, x)
        indep = V.forward_from_sd_convnext(sd, x, 3)
        rel = np.abs(indep - ours).max() / (np.abs(indep).max() + 1e-9)
        assert rel < 1e-4

    def test_independent_forward_catches_permutation(self):
        V = self._script_mod()
        sd = synth_convnext_tiny_state_dict(np.random.default_rng(1))
        p = convert_torchvision_convnext(sd, num_stages=3)
        a = p["features_1_block_0"]["dwconv"]["kernel"]
        p["features_1_block_0"]["dwconv"]["kernel"] = \
            p["features_1_block_1"]["dwconv"]["kernel"]
        p["features_1_block_1"]["dwconv"]["kernel"] = a
        model = convnext_tiny_26_features(num_stages=3)
        x = np.random.default_rng(2).normal(
            size=(1, 64, 64, 3)).astype(np.float32)
        ours = V.forward_ours(model, p, None, x)
        indep = V.forward_from_sd_convnext(sd, x, 3)
        rel = np.abs(indep - ours).max() / (np.abs(indep).max() + 1e-9)
        assert rel > 1e-4
