"""Validate + bench the on-core-PRNG gumbel-hard head on real TPU, and
measure the full parity forward with it. Run alone (single TPU client)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from count_pipnet_tpu.ops.pallas.gumbel_head import gumbel_hard_counts
from count_pipnet_tpu.models import get_count_network
from count_pipnet_tpu.models.quantized import fused_convnext_apply
from count_pipnet_tpu.ops.ste import create_modified_encoding


def main():
    # 1) structural validation of the PRNG path
    feats = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, 26, 26, 768)).astype(np.float32))
    f = jax.jit(lambda v, s: gumbel_hard_counts(v, s))
    counts = jax.device_get(f(feats, 7))
    total = counts.sum(axis=1)
    assert np.allclose(total, 676.0), total
    counts2 = jax.device_get(f(feats, 7))
    assert np.array_equal(counts, counts2), "same seed must reproduce"
    counts3 = jax.device_get(f(feats, 8))
    assert not np.array_equal(counts, counts3), "different seed differs"
    # statistical sanity: add a dominant channel, expect it to win most
    feats_dom = feats.at[..., 0].add(5.0)
    cdom = jax.device_get(f(feats_dom, 9))
    frac = cdom[:, 0].sum() / cdom.sum()
    print(f"PRNG path OK; dominant-channel win rate {frac:.3f}")

    # 2) full parity forward with the pallas gumbel head
    class A:
        net = "convnext_tiny_26"
        num_features = 0
        use_mid_layers = False
        num_stages = 7
        bias = False
        activation = "gumbel_softmax"
        intermediate_layer = "onehot"
        positive_grad_strategy = None
        backward_clamp_strategy = "Identity"
        disable_pretrained = True

    model, _ = get_count_network(200, A, max_count=3, use_ste=True,
                                 dtype=jnp.bfloat16)
    batch = 256
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch, 224, 224, 3)).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0),
                         "gumbel": jax.random.PRNGKey(1)}, x[:1])["params"]

    @jax.jit
    def infer(params, x, seed):
        feats = fused_convnext_apply(params["backbone"], x,
                                     stride_threshold=100, num_stages=7)
        counts = gumbel_hard_counts(feats, seed)
        clamped = jnp.clip(jnp.round(counts), 0.0, 3.0)
        enc = create_modified_encoding(clamped, 3)
        enc = enc.reshape(enc.shape[0], -1)
        w = params["classification"]["weight"]
        return clamped, enc @ jax.nn.relu(w).T

    jax.device_get(infer(params, x, 0))
    t0 = time.perf_counter()
    for i in range(20):
        r = infer(params, x, i)
    jax.device_get(r[1])
    dt = (time.perf_counter() - t0) / 20
    print(json.dumps({"variant": "parity_fused_pallas_gumbel",
                      "imgs_per_sec": round(batch / dt, 1),
                      "ms": round(dt * 1e3, 2)}))


if __name__ == "__main__":
    main()
