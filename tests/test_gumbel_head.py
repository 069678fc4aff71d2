"""Gumbel-hard counting head kernel.

CPU tests use injected noise (the on-core PRNG path has no CPU interpreter
lowering and is validated on real TPU by scripts/validate_gumbel_head.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from count_pipnet_tpu.ops.pallas.gumbel_head import gumbel_hard_counts


def ref_counts(feats, noise):
    noisy = feats + noise
    b, h, w, c = noisy.shape
    winner = np.asarray(jnp.argmax(noisy.reshape(b, h * w, c), axis=-1))
    out = np.zeros((b, c), np.float32)
    for i in range(b):
        out[i] = np.bincount(winner[i], minlength=c)
    return out


class TestGumbelHardCounts:
    def _feats_noise(self, shape, seed):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        feats = jax.random.normal(k1, shape)
        noise = jax.random.gumbel(k2, shape)
        return feats, noise

    def test_matches_reference_histogram_exactly(self):
        feats, noise = self._feats_noise((2, 5, 5, 128), 0)
        got = gumbel_hard_counts(feats, seed=0, noise=noise,
                                 interpret=True)
        np.testing.assert_array_equal(np.asarray(got),
                                      ref_counts(feats, noise))

    def test_counts_sum_to_patches(self):
        feats, noise = self._feats_noise((3, 6, 6, 128), 1)
        counts = gumbel_hard_counts(feats, seed=0, noise=noise,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(counts).sum(axis=1), 36.0)
        assert jnp.all(counts >= 0)

    def test_hw_tiling_remainder_masked(self):
        # 26x26 = 676 patches -> 6 tiles of 128 with a remainder of 36
        feats, noise = self._feats_noise((1, 26, 26, 128), 2)
        counts = gumbel_hard_counts(feats, seed=0, noise=noise,
                                    interpret=True)
        assert float(np.asarray(counts).sum()) == 676.0
        np.testing.assert_array_equal(np.asarray(counts),
                                      ref_counts(feats, noise))

    def test_batch_padding(self):
        # batch 3 pads to the 8-row batch tile; padded rows must not leak
        feats, noise = self._feats_noise((3, 4, 4, 128), 3)
        counts = gumbel_hard_counts(feats, seed=0, noise=noise,
                                    interpret=True)
        assert counts.shape == (3, 128)
        np.testing.assert_array_equal(np.asarray(counts),
                                      ref_counts(feats, noise))

    def test_dominant_logit_wins_without_noise(self):
        rng = np.random.default_rng(3)
        feats = rng.normal(size=(1, 4, 4, 128)).astype(np.float32) * 0.01
        winners = rng.integers(0, 128, size=(4, 4))
        for i in range(4):
            for j in range(4):
                feats[0, i, j, winners[i, j]] = 50.0
        zero_noise = jnp.zeros_like(jnp.asarray(feats))
        counts = np.asarray(gumbel_hard_counts(
            jnp.asarray(feats), seed=0, noise=zero_noise,
            interpret=True))[0]
        expected = np.bincount(winners.reshape(-1), minlength=128)
        np.testing.assert_array_equal(counts, expected)


class TestFusedBlockGumbelCounts:
    """Fused final-block + gumbel-hard head kernel
    (ops/pallas/gumbel_head.py:fused_block_gumbel_counts): must equal the
    two-kernel chain fused_block_apply -> gumbel_hard_counts exactly
    under identical injected noise, in bf16 and static-int8 modes."""

    def _block_params(self, c, seed):
        rng = np.random.default_rng(seed)
        hdim = 4 * c
        return dict(
            dwk=rng.normal(size=(7, 7, 1, c)).astype(np.float32) * 0.1,
            dwb=rng.normal(size=(c,)).astype(np.float32) * 0.01,
            lns=(1 + rng.normal(size=(c,)) * 0.01).astype(np.float32),
            lnb=rng.normal(size=(c,)).astype(np.float32) * 0.01,
            w1=rng.normal(size=(c, hdim)).astype(np.float32) * 0.05,
            b1=rng.normal(size=(hdim,)).astype(np.float32) * 0.01,
            w2=rng.normal(size=(hdim, c)).astype(np.float32) * 0.05,
            b2=rng.normal(size=(c,)).astype(np.float32) * 0.01,
            g=np.full((c,), 1e-2, np.float32),
        )

    def _calibrate(self, x4, p):
        c = x4.shape[-1]
        d = jax.lax.conv_general_dilated(
            jnp.asarray(x4), jnp.asarray(p["dwk"]), (1, 1),
            ((3, 3), (3, 3)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c) + p["dwb"]
        mu = jnp.mean(d, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(d - mu), axis=-1, keepdims=True)
        n = (d - mu) * jax.lax.rsqrt(var + 1e-6) * p["lns"] + p["lnb"]
        a = jax.nn.gelu(n @ p["w1"] + p["b1"], approximate=True)
        return (np.asarray(jnp.max(jnp.abs(n), axis=(0, 1, 2))),
                np.asarray(jnp.max(jnp.abs(a), axis=(0, 1, 2))))

    @pytest.mark.parametrize("int8", [False, True])
    @pytest.mark.parametrize("hw", [(9, 9), (26, 26)])
    def test_matches_block_then_head(self, int8, hw):
        from count_pipnet_tpu.ops.pallas.fused_block import \
            fused_block_apply
        from count_pipnet_tpu.ops.pallas.gumbel_head import \
            fused_block_gumbel_counts
        h, w = hw
        c = 128
        rng = np.random.default_rng(1)
        p = self._block_params(c, 7)
        x4 = rng.normal(size=(2, h, w, c)).astype(np.float32)
        noise = jax.random.gumbel(jax.random.PRNGKey(4), (2, h * w, c))
        scales = self._calibrate(x4, p) if int8 else None
        common = (h, w, p["dwk"], p["dwb"], p["lns"], p["lnb"], p["w1"],
                  p["b1"], p["w2"], p["b2"], p["g"])

        blk = fused_block_apply(
            jnp.asarray(x4.reshape(2, h * w, c)), *common, int8=int8,
            act_scales=scales, interpret=True)
        feats = np.asarray(blk, np.float32).reshape(2, h, w, c)
        ref = ref_counts(jnp.asarray(feats),
                         np.asarray(noise).reshape(2, h, w, c))

        got = fused_block_gumbel_counts(
            jnp.asarray(x4.reshape(2, h * w, c)), *common, seed=0,
            int8=int8, act_scales=scales, noise=noise, interpret=True)
        assert got.shape == (2, c)
        np.testing.assert_array_equal(np.asarray(got), ref)
        np.testing.assert_allclose(np.asarray(got).sum(axis=1), h * w)

    def test_serving_forward_gumbel_head_fused_matches_unfused(self):
        """fused_block_convnext_apply(gumbel_head=...) at 7 stages must
        reproduce apply-then-gumbel_hard_counts under the same noise."""
        from count_pipnet_tpu.models.convnext import \
            convnext_tiny_26_features
        from count_pipnet_tpu.models.quantized import \
            fused_block_convnext_apply
        from count_pipnet_tpu.ops.pallas.gumbel_head import \
            gumbel_hard_counts
        model = convnext_tiny_26_features(num_stages=7,
                                          dtype=jnp.float32)
        x = jnp.asarray(np.random.default_rng(3).normal(
            size=(2, 64, 64, 3)).astype(np.float32))
        params = model.init({"params": jax.random.PRNGKey(0)},
                            x[:1])["params"]
        # int8 off everywhere: the unfused stage-4 path would use
        # DYNAMIC int8 (no calibration here) which the fused head kernel
        # deliberately does not carry — compare the bf16 paths exactly.
        feats = fused_block_convnext_apply(
            params, x, num_stages=7, dtype=jnp.float32,
            int8_min_dim=10**9, interpret=True)
        noise = jax.random.gumbel(jax.random.PRNGKey(5), feats.shape)
        ref = gumbel_hard_counts(feats, 0, noise=noise, interpret=True)
        got = fused_block_convnext_apply(
            params, x, num_stages=7, dtype=jnp.float32,
            int8_min_dim=10**9,
            gumbel_head={"seed": 0, "noise": noise}, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_serving_forward_gumbel_head_padded_fallback(self):
        """At num_stages=3 the final block is in the padded branch: the
        gumbel_head argument must fall back to block-then-head."""
        from count_pipnet_tpu.models.convnext import \
            convnext_tiny_26_features
        from count_pipnet_tpu.models.quantized import \
            fused_block_convnext_apply
        from count_pipnet_tpu.ops.pallas.gumbel_head import \
            gumbel_hard_counts
        model = convnext_tiny_26_features(num_stages=3,
                                          dtype=jnp.float32)
        x = jnp.asarray(np.random.default_rng(4).normal(
            size=(2, 64, 64, 3)).astype(np.float32))
        params = model.init({"params": jax.random.PRNGKey(0)},
                            x[:1])["params"]
        feats = fused_block_convnext_apply(
            params, x, num_stages=3, dtype=jnp.float32, interpret=True)
        noise = jax.random.gumbel(jax.random.PRNGKey(6), feats.shape)
        ref = gumbel_hard_counts(feats, 0, noise=noise, interpret=True)
        got = fused_block_convnext_apply(
            params, x, num_stages=3, dtype=jnp.float32,
            gumbel_head={"seed": 0, "noise": noise}, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
