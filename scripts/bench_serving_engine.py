"""End-to-end ServingEngine throughput/latency on the real TPU.

Drives the same int8 whole-block + gumbel-histogram-head forward as
bench.py, but through the request-batching engine with single-image
open-loop submission — the production serving shape, including host
padding, host->device transfer, and pipelined drain.

    python scripts/bench_serving_engine.py [--n 2048] [--rate 0]

--rate 0 submits as fast as possible (closed throughput test);
--rate R submits at R img/s (open-loop latency test).
"""

import argparse
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
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--rate", type=float, default=0.0)
    ap.add_argument("--image", type=int, default=224)
    ap.add_argument("--max_batch", type=int, default=256)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from count_pipnet_tpu.models import get_count_network
    from count_pipnet_tpu.models.quantized import fused_block_convnext_apply
    from count_pipnet_tpu.ops.pallas.gumbel_head import gumbel_hard_counts
    from count_pipnet_tpu.ops.ste import create_modified_encoding
    from count_pipnet_tpu.serving import ServingEngine

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

    dtype = jnp.bfloat16
    model, _ = get_count_network(200, A, max_count=3, use_ste=True,
                                 dtype=dtype)
    img = args.image
    params = model.init(
        {"params": jax.random.PRNGKey(0),
         "gumbel": jax.random.PRNGKey(1)},
        jnp.zeros((1, img, img, 3), jnp.float32))["params"]

    @jax.jit
    def _infer(params, x):
        feats = fused_block_convnext_apply(
            params["backbone"], x, stride_threshold=100, num_stages=7)
        counts = gumbel_hard_counts(feats, 0)
        clamped = jnp.clip(jnp.round(counts), 0.0, 3.0)
        enc = create_modified_encoding(clamped, 3)
        enc = enc.reshape(enc.shape[0], -1)
        w = params["classification"]["weight"]
        return clamped, enc @ jax.nn.relu(w).T

    infer = lambda x: _infer(params, x)  # noqa: E731

    shape = (img, img, 3)
    ladder = tuple(b for b in (8, 32, 64, 128, 256)
                   if b <= args.max_batch) or (args.max_batch,)
    # pre-compile every ladder size outside the timed region
    for b in ladder:
        jax.device_get(infer(np.zeros((b,) + shape, np.float32)))

    rng = np.random.default_rng(0)
    pool = rng.normal(size=(64,) + shape).astype(np.float32)

    with ServingEngine(infer, shape, batch_sizes=ladder,
                       max_wait_ms=args.max_wait_ms) as eng:
        futs = []
        t0 = time.perf_counter()
        for i in range(args.n):
            futs.append(eng.submit(pool[i % 64]))
            if args.rate > 0:
                target = t0 + (i + 1) / args.rate
                now = time.perf_counter()
                if target > now:
                    time.sleep(target - now)
        for f in futs:
            f.result(timeout=300)
        dt = time.perf_counter() - t0
        time.sleep(0.2)
        st = eng.stats()

    print(f"engine: {args.n} imgs in {dt:.2f}s = {args.n/dt:7.1f} img/s "
          f"| batches {st['batches']} padded {st['padded_slots']} "
          f"| p50 {st.get('latency_ms_p50', 0):.1f} ms "
          f"p99 {st.get('latency_ms_p99', 0):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
