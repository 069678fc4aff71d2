"""Prototype-map extraction latency (the BASELINE.json p50 metric).

Measures the per-image latency of extracting prototype feature maps +
pooled scores + argmax patch locations — the device pass behind
vis_pipnet.score_projection_set, which replaces the reference's bs=1
projection loop (reference util/vis_pipnet.py:209-274,664-754).

Run alone (single TPU client).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from count_pipnet_tpu.models import get_count_network
from count_pipnet_tpu.interpret.vis_pipnet import _make_score_fn


def main():
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
    x0 = jnp.zeros((1, 224, 224, 3), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "gumbel": jax.random.PRNGKey(1)}, x0)["params"]

    for batch in (1, 64):
        score = _make_score_fn(model, params, {}, 1.0)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(batch, 224, 224, 3)).astype(np.float32))
        rng = jax.random.PRNGKey(2)
        jax.device_get(score(x, rng))
        times = []
        for i in range(20):
            t0 = time.perf_counter()
            jax.device_get(score(x, jax.random.fold_in(rng, i)))
            times.append(time.perf_counter() - t0)
        p50 = sorted(times)[len(times) // 2]
        print(json.dumps({
            "metric": "prototype_map_extraction_p50",
            "batch": batch,
            "p50_ms_per_batch": round(p50 * 1e3, 2),
            "p50_ms_per_image": round(p50 * 1e3 / batch, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
