"""Per-stage marginal cost of the CURRENT whole-block serving path.

Times fused_block_convnext_apply truncated at num_stages = 1..7
(features_1=stage1, 2=ds1, 3=stage2, 4=ds2, 5=stage3, 6=ds3, 7=stage4)
and prints the marginal ms of each segment at batch 256.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))

from count_pipnet_tpu.models import convnext_tiny_26_features  # noqa:E402
from count_pipnet_tpu.models.quantized import (  # noqa: E402
    fused_block_convnext_apply,
)

NAMES = {1: "stem+stage1", 2: "+ds1", 3: "+stage2", 4: "+ds2",
         5: "+stage3", 6: "+ds3", 7: "+stage4"}


def main():
    batch, iters = 256, 15
    model = convnext_tiny_26_features(num_stages=7, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch, 224, 224, 3)).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0)}, x[:1])["params"]

    prev = 0.0
    for ns in range(1, 8):
        fn = jax.jit(lambda p, v, ns=ns: fused_block_convnext_apply(
            p, v, stride_threshold=100, num_stages=ns).sum())
        jax.device_get(fn(params, x))
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(params, x)
        jax.device_get(r)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{NAMES[ns]:12s} cum {dt:7.2f} ms   marginal "
              f"{dt - prev:7.2f} ms", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
