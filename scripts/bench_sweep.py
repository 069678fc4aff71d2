"""Throughput sweep over inference-path variants (diagnosis tool).

Variants: backbone only / full forward with gumbel vs softmax / serving
fast path (Pallas fused head) / rbg PRNG. Run alone — the TPU allows one
client at a time.
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
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--rbg", action="store_true")
    ap.add_argument("--variants", default="backbone,gumbel,softmax,serving")
    args = ap.parse_args()

    import jax
    if args.rbg:
        jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import numpy as np
    from count_pipnet_tpu.models import get_count_network
    from count_pipnet_tpu.models.serving import make_serving_fn

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

    batch, image = args.batch, 224
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch, image, image, 3)).astype(np.float32))
    rng = jax.random.PRNGKey(2)

    def timeit(name, fn, *fargs):
        jax.device_get(fn(*fargs))
        t0 = time.perf_counter()
        for i in range(args.iters):
            r = fn(*fargs)
        jax.device_get(jax.tree_util.tree_leaves(r)[-1])
        dt = time.perf_counter() - t0
        print(json.dumps({"variant": name,
                          "imgs_per_sec": round(batch * args.iters / dt, 1),
                          "ms_per_batch": round(dt / args.iters * 1e3, 2)}),
              flush=True)

    variants = set(args.variants.split(","))

    model_g, _ = get_count_network(200, A, max_count=3, use_ste=True,
                                   dtype=jnp.bfloat16)
    params = model_g.init({"params": jax.random.PRNGKey(0),
                           "gumbel": jax.random.PRNGKey(1)}, x)["params"]

    if "backbone" in variants:
        bb = jax.jit(lambda p, v: model_g.backbone.apply(
            {"params": p}, v, deterministic=True).sum())
        timeit("backbone_only", bb, params["backbone"], x)

    if "gumbel" in variants:
        @jax.jit
        def infer_g(p, v, r):
            _, counts, out = model_g.apply(
                {"params": p}, v, inference=True, train=False,
                rngs={"gumbel": r})
            return counts, out
        timeit("full_gumbel", infer_g, params, x, rng)

    if "softmax" in variants:
        A.activation = "softmax"
        model_s, _ = get_count_network(200, A, max_count=3, use_ste=True,
                                       dtype=jnp.bfloat16)

        @jax.jit
        def infer_s(p, v):
            _, counts, out = model_s.apply(
                {"params": p}, v, inference=True, train=False)
            return counts, out
        timeit("full_softmax", infer_s, params, x)

        if "serving" in variants:
            serve = jax.jit(make_serving_fn(model_s, use_pallas=True))
            timeit("serving_pallas", serve, params, x)
            serve_xla = jax.jit(make_serving_fn(model_s, use_pallas=False))
            timeit("serving_xla", serve_xla, params, x)


if __name__ == "__main__":
    main()
