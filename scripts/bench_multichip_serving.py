"""Mesh-sharded int8 serving bench (VERDICT r4 item 7).

Runs bench.py's headline serving path — whole-block int8 Pallas backbone
+ on-core-PRNG gumbel-histogram head (BENCH_NOTES.md) — explicitly
sharded over a ``jax.sharding.Mesh``: params replicated, batch sharded
over the mesh's data axis, exactly what multi-chip serving would run.

With ``--mesh_shape 1`` on the real chip this measures the sharding
machinery's overhead against the unsharded bench.py number (should be
within noise: a 1-device mesh adds no collectives, only the
NamedSharding plumbing). The moment more chips appear the same command
with ``--mesh_shape N`` demonstrates batch-parallel scaling — zero
collectives in a data-parallel forward, so scaling is linear up to the
per-chip batch floor.

On CPU backends the Pallas kernels are unavailable; the script falls
back to the plain flax forward on a virtual mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8) as a wiring smoke
test only — CPU numbers are not throughput evidence.

Reference scaling story: the reference's only device parallelism is
single-process nn.DataParallel (reference main.py:118, untested beyond
one GPU per main.py:75); SURVEY.md §5 maps it to batch-sharded inputs +
replicated params over a 1-D mesh.

Run alone on the real TPU (single claimer!):
    python scripts/bench_multichip_serving.py --mesh_shape 1
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
    ap.add_argument("--mesh_shape", type=int, default=1)
    ap.add_argument("--batch", type=int, default=256,
                    help="GLOBAL batch (sharded over the mesh)")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from count_pipnet_tpu.models import get_count_network
    from count_pipnet_tpu.parallel.mesh import make_mesh
    from count_pipnet_tpu.utils.backend import wait_for_backend

    wait_for_backend()
    on_tpu = jax.devices()[0].platform != "cpu"

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

    image = 224
    batch = args.batch if on_tpu else 8
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model, _ = get_count_network(200, A, max_count=3, use_ste=True,
                                 dtype=dtype)
    rngs = {"params": jax.random.PRNGKey(0),
            "gumbel": jax.random.PRNGKey(1)}
    x0 = jnp.zeros((batch, image, image, 3), jnp.float32)
    params = model.init(rngs, x0)["params"]

    if on_tpu:
        from count_pipnet_tpu.models.quantized import (
            calibrate_act_scales, fused_block_convnext_apply,
        )
        from count_pipnet_tpu.ops.ste import create_modified_encoding

        x_cal = jnp.asarray(np.random.default_rng(42).normal(
            size=(64, image, image, 3)).astype(np.float32))
        act_scales = jax.device_get(jax.jit(
            lambda p, v: calibrate_act_scales(p, v, num_stages=7))(
                params["backbone"], x_cal))

        def fn(params, x, seed):
            # bench.py's round-5 canonical: in-kernel pad marshalling +
            # fused final-block/gumbel-head (BENCH_NOTES "Round 5").
            counts = fused_block_convnext_apply(
                params["backbone"], x, stride_threshold=100, num_stages=7,
                act_scales=act_scales, inkernel_pad=True,
                gumbel_head={"seed": seed})
            clamped = jnp.clip(jnp.round(counts), 0.0, 3.0)
            enc = create_modified_encoding(clamped, 3)
            enc = enc.reshape(enc.shape[0], -1)
            w = params["classification"]["weight"]
            return clamped, enc @ jax.nn.relu(w).T
    else:
        def fn(params, x, seed):
            _, counts, out = model.apply(
                {"params": params}, x, inference=True, train=False,
                rngs={"gumbel": jax.random.PRNGKey(0)})
            return counts, out

    mesh = make_mesh(args.mesh_shape)
    n_dev = mesh.devices.size
    if batch % n_dev:
        raise SystemExit(f"batch {batch} not divisible by mesh {n_dev}")
    axis = mesh.axis_names[0]
    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P(axis))
    sharded_params = jax.device_put(params, repl)
    jfn = jax.jit(fn, in_shardings=(repl, batched, repl),
                  out_shardings=batched)

    x = jax.device_put(jnp.asarray(np.random.default_rng(0).normal(
        size=(batch, image, image, 3)).astype(np.float32)), batched)
    # compile + warmup (device_get: block_until_ready alone does not
    # guarantee remote completion on the tunnel backend, BENCH_NOTES.md).
    # Seeds are plain ints exactly as in bench.py — a per-step
    # device_put would serialize the dispatch pipeline.
    jax.device_get(jfn(sharded_params, x, 0))
    jax.device_get(jfn(sharded_params, x, 0))

    iters = args.iters if on_tpu else 3
    t0 = time.perf_counter()
    for i in range(iters):
        counts, out = jfn(sharded_params, x, i + 1)
    out_host = jax.device_get(out)
    dt = time.perf_counter() - t0
    assert np.all(np.isfinite(out_host))

    imgs_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "multichip_serving_throughput",
        "mesh_shape": n_dev,
        "global_batch": batch,
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec",
        "per_chip": round(imgs_per_sec / n_dev, 1),
    }))


if __name__ == "__main__":
    main()
