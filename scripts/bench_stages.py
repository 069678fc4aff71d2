"""Localize backbone cost: time stage-truncated backbones and batch sizes.

Run alone (single TPU client).
"""

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[256])
    ap.add_argument("--stages", type=int, nargs="+", default=[1, 3, 5, 7])
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from count_pipnet_tpu.models import convnext_tiny_26_features

    for batch in args.batches:
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(batch, 224, 224, 3)).astype(np.float32))
        for stages in args.stages:
            model = convnext_tiny_26_features(num_stages=stages,
                                              dtype=jnp.bfloat16)
            params = model.init({"params": jax.random.PRNGKey(0)},
                                x[:1])["params"]
            fn = jax.jit(lambda p, v: model.apply(
                {"params": p}, v, deterministic=True).sum())
            jax.device_get(fn(params, x))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                r = fn(params, x)
            jax.device_get(r)
            dt = (time.perf_counter() - t0) / args.iters
            print(json.dumps({
                "batch": batch, "stages": stages,
                "ms": round(dt * 1e3, 2),
                "imgs_per_sec": round(batch / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
