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
