"""Int8 quantized serving backbone: numerical agreement with the bf16
reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from count_pipnet_tpu.models import get_count_network
from count_pipnet_tpu.models.quantized import (
    quantize_convnext_params, quant_convnext_apply, int8_rowwise_matmul,
)
from count_pipnet_tpu.models.serving import make_serving_fn


class Args:
    net = "convnext_tiny_26"
    num_features = 8
    use_mid_layers = True
    num_stages = 2
    bias = False
    activation = "softmax"
    intermediate_layer = "onehot"
    positive_grad_strategy = None
    backward_clamp_strategy = "Identity"
    disable_pretrained = True


@pytest.fixture(scope="module")
def setup():
    model, _ = get_count_network(3, Args, max_count=3, use_ste=True)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    return model, params, x


class TestInt8Matmul:
    def test_close_to_fp32(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(96, 192)).astype(np.float32) * 0.1)
        from count_pipnet_tpu.models.quantized import _quantize_weight
        q, scale = _quantize_weight(w)
        got = int8_rowwise_matmul(x, q, scale)
        ref = x @ w
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert rel < 0.02  # int8 noise, well under 2%

    def test_zero_input_safe(self):
        x = jnp.zeros((4, 8))
        w = jnp.zeros((8, 16))
        from count_pipnet_tpu.models.quantized import _quantize_weight
        q, scale = _quantize_weight(w)
        got = int8_rowwise_matmul(x, q, scale)
        assert jnp.all(got == 0) and jnp.all(jnp.isfinite(got))


class TestQuantBackbone:
    def test_features_close_to_flax(self, setup):
        model, params, x = setup
        ref = model.backbone.apply({"params": params["backbone"]}, x,
                                   deterministic=True)
        qp = quantize_convnext_params(params["backbone"])
        got = quant_convnext_apply(
            qp, x, stride_threshold=100, num_stages=2)
        assert got.shape == ref.shape
        rel = float(jnp.linalg.norm(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))
                    / jnp.linalg.norm(ref.astype(jnp.float32)))
        assert rel < 0.05

    def test_serving_quantized_counts_match(self, setup):
        model, params, x = setup
        serve = make_serving_fn(model, use_pallas=False)
        serve_q = make_serving_fn(model, use_pallas=False, quantize=True)
        counts, out = serve(params, x)
        counts_q, out_q = serve_q(params, x)
        # counts are rounded integers in [0, 3] — int8 noise should rarely
        # flip a bin on random init; allow at most 20% disagreement
        agreement = float(jnp.mean((counts == counts_q).astype(jnp.float32)))
        assert agreement > 0.8
        assert jnp.all(jnp.isfinite(out_q))


class TestFusedMLPBackbone:
    def test_fused_matches_flax(self, setup):
        from count_pipnet_tpu.models.quantized import fused_convnext_apply
        model, params, x = setup
        ref = model.backbone.apply({"params": params["backbone"]}, x,
                                   deterministic=True)
        got = fused_convnext_apply(params["backbone"], x,
                                   stride_threshold=100, num_stages=2,
                                   interpret=True)
        rel = float(jnp.linalg.norm(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))
                    / jnp.linalg.norm(ref.astype(jnp.float32)))
        assert rel < 0.01

    def test_serving_fused_mlp_counts_match(self, setup):
        model, params, x = setup
        serve = make_serving_fn(model, use_pallas=False)
        serve_f = make_serving_fn(model, use_pallas=False, fused_mlp=True,
                                  interpret=True)
        counts, _ = serve(params, x)
        counts_f, out_f = serve_f(params, x)
        agreement = float(jnp.mean((counts == counts_f)
                                   .astype(jnp.float32)))
        assert agreement > 0.95
        assert jnp.all(jnp.isfinite(out_f))


class TestDwconvKernel:
    def test_matches_lax_conv(self):
        from count_pipnet_tpu.ops.pallas.dwconv import dwconv7
        from count_pipnet_tpu.models.quantized import _dwconv7
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 9, 9, 128)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(7, 7, 1, 128)).astype(np.float32)
                        * 0.1)
        b = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
        ref = _dwconv7(x, k, b, jnp.float32)
        got = dwconv7(x, k, b, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


class TestFusedBlockKernel:
    """Whole-block serving kernel (ops/pallas/fused_block.py): dwconv +
    LN + MLP + layer-scale + residual in one Pallas call, bf16 and int8
    matmul modes, vs an op-by-op XLA reference."""

    def _ref_block(self, x4, dwk, dwb, lns, lnb, w1, b1, w2, b2, g):
        from count_pipnet_tpu.models.quantized import _dwconv7, _layer_norm
        d = _dwconv7(x4, dwk, dwb, jnp.float32)
        n = _layer_norm(d, lns, lnb)
        a = jax.nn.gelu(n @ w1 + b1, approximate=True)
        return x4 + (a @ w2 + b2) * g

    def _mk(self, seed=0, b=2, h=9, w=9, c=128):
        rng = np.random.default_rng(seed)
        def arr(*s, scale=1.0):
            return jnp.asarray(rng.normal(size=s).astype(np.float32)
                               * scale)
        return (arr(b, h, w, c), arr(7, 7, 1, c, scale=0.1),
                arr(c, scale=0.1), arr(c, scale=0.2) + 1.0,
                arr(c, scale=0.1), arr(c, 4 * c, scale=0.05),
                arr(4 * c, scale=0.05), arr(4 * c, c, scale=0.05),
                arr(c, scale=0.05), arr(c, scale=0.2))

    def test_bf16_mode_matches_reference(self):
        from count_pipnet_tpu.ops.pallas.fused_block import \
            fused_block_apply
        x4, *ps = self._mk()
        b, h, w, c = x4.shape
        ref = np.asarray(self._ref_block(x4, *ps))
        got = np.asarray(fused_block_apply(
            x4.reshape(b, h * w, c), h, w, *ps,
            interpret=True)).reshape(b, h, w, c)
        scale = np.max(np.abs(ref))
        np.testing.assert_allclose(got / scale, ref / scale, atol=2e-3)

    def test_int8_mode_close_to_reference(self):
        from count_pipnet_tpu.ops.pallas.fused_block import \
            fused_block_apply
        x4, *ps = self._mk(seed=1)
        b, h, w, c = x4.shape
        ref = np.asarray(self._ref_block(x4, *ps))
        got = np.asarray(fused_block_apply(
            x4.reshape(b, h * w, c), h, w, *ps, int8=True,
            interpret=True)).reshape(b, h, w, c)
        scale = np.max(np.abs(ref))
        np.testing.assert_allclose(got / scale, ref / scale, atol=1e-2)

    def test_full_backbone_matches_flax(self, setup):
        from count_pipnet_tpu.models.quantized import \
            fused_block_convnext_apply
        model, params, x = setup
        bb = model.backbone
        ref = bb.apply({"params": params["backbone"]}, x,
                       deterministic=True)
        got = fused_block_convnext_apply(
            params["backbone"], x, stride_threshold=bb.stride_threshold,
            num_stages=bb.num_stages, stage_settings=bb.stage_settings,
            dtype=jnp.float32, int8_min_dim=10 ** 9, interpret=True)
        scale = float(jnp.max(jnp.abs(ref))) + 1e-9
        np.testing.assert_allclose(np.asarray(got) / scale,
                                   np.asarray(ref) / scale, atol=5e-3)


class TestInt8Gemm:
    def test_matches_float_gemm(self):
        from count_pipnet_tpu.ops.pallas.int8_gemm import int8_quant_gemm
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(70, 64)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.normal(size=(48,)).astype(np.float32) * 0.1)
        ref = np.asarray(x @ w + b)
        got = np.asarray(int8_quant_gemm(x, w, bias=b, row_tile=16,
                                         interpret=True))
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got / scale, ref / scale, atol=2e-2)

    def test_int8_downsample_path_matches_conv(self):
        """The stride-1 2x2 im2col + int8 GEMM downsample equals the XLA
        conv (models/quantized.py fused_block_convnext_apply ds branch)."""
        from count_pipnet_tpu.ops.pallas.int8_gemm import int8_quant_gemm
        from count_pipnet_tpu.models.quantized import _conv
        rng = np.random.default_rng(1)
        b, h, w, cin, cout = 2, 9, 9, 32, 48
        hn = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype(np.float32))
        kern = jnp.asarray(rng.normal(size=(2, 2, cin, cout))
                           .astype(np.float32) * 0.1)
        bias = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
        ref = np.asarray(_conv(hn, kern, bias, 1, jnp.float32))
        cols = jnp.concatenate([hn[:, :-1, :-1], hn[:, :-1, 1:],
                                hn[:, 1:, :-1], hn[:, 1:, 1:]], axis=-1)
        got = np.asarray(int8_quant_gemm(
            cols.reshape(b * (h - 1) * (w - 1), 4 * cin),
            kern.reshape(4 * cin, cout), bias=bias, row_tile=32,
            interpret=True)).reshape(b, h - 1, w - 1, cout)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got / scale, ref / scale, atol=2e-2)


class TestDwBf16Taps:
    def test_dw_bf16_taps_close(self):
        """bf16 tap math stays within bf16-grade tolerance of f32."""
        from count_pipnet_tpu.ops.pallas.fused_block import \
            fused_block_apply
        x4, *ps = TestFusedBlockKernel._mk(TestFusedBlockKernel(), seed=2)
        b, h, w, c = x4.shape
        f32 = np.asarray(fused_block_apply(
            x4.reshape(b, h * w, c), h, w, *ps, interpret=True))
        bf16 = np.asarray(fused_block_apply(
            x4.reshape(b, h * w, c), h, w, *ps, dw_bf16=True,
            interpret=True))
        scale = np.abs(f32).max()
        np.testing.assert_allclose(bf16 / scale, f32 / scale, atol=3e-2)


class TestDownsampleInt8Branch:
    def test_backbone_with_ds_int8_close_to_flax(self):
        """int8_min_dim low enough to trigger the im2col int8 downsample
        (stride-1 ds2 at num_stages=4) inside the full serving forward."""
        from count_pipnet_tpu.models.quantized import \
            fused_block_convnext_apply

        class A(Args):
            num_stages = 4

        model, _ = get_count_network(3, A, max_count=3, use_ste=True)
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
        params = model.init({"params": jax.random.PRNGKey(1)}, x)["params"]
        bb = model.backbone
        ref = bb.apply({"params": params["backbone"]}, x,
                       deterministic=True)
        got = fused_block_convnext_apply(
            params["backbone"], x, stride_threshold=bb.stride_threshold,
            num_stages=bb.num_stages, stage_settings=bb.stage_settings,
            dtype=jnp.float32, int8_min_dim=96, int8_downsample=True,
            interpret=True)
        scale = float(jnp.max(jnp.abs(ref))) + 1e-9
        np.testing.assert_allclose(np.asarray(got) / scale,
                                   np.asarray(ref) / scale, atol=3e-2)
