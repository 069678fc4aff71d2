"""Serving-glue A/B: the three round-5 glue eliminations, on-chip.

The round-5 device trace (BENCH_NOTES.md "Round 5", scripts/
xplane_report.py) priced the non-kernel glue in bench.py's 92.14 ms
serving step at batch 256:

  - ~1.34 ms  pad 676->768 + bf16->f32 convert feeding the gumbel head
  - ~0.79 ms  relayout copy between stage 4 and the head
  - ~2.13 ms  pad/slice copies at the padded-plane stage boundaries

Three opt-in eliminations exist; this script measures each alone and
composed, asserting counts parity (injected-noise, vs the plain flax
forward — bench.py's own regression check) for every variant:

  ragged  — gumbel_hard_counts takes the native-dtype unpadded plane
            (GUMBEL_HEAD_PADDED=0; ops/pallas/gumbel_head.py)
  inkpad  — padded-plane stages marshal the pad layout in VMEM
            (fused_block_apply_padded pad_in/unpad_out)
  fusedhd — final block + gumbel head in ONE kernel; the last feature
            plane never touches HBM
            (ops/pallas/gumbel_head.py:fused_block_gumbel_counts)

Run alone on the real TPU (single claimer!):
    python scripts/bench_serving_glue.py
"""

import argparse
import itertools
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
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=3,
                    help="timing repeats per variant (report the best)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from count_pipnet_tpu.models import get_count_network
    from count_pipnet_tpu.models.quantized import (
        calibrate_act_scales, fused_block_convnext_apply,
    )
    from count_pipnet_tpu.ops.pallas.gumbel_head import gumbel_hard_counts
    from count_pipnet_tpu.utils.backend import wait_for_backend

    wait_for_backend()
    if jax.devices()[0].platform == "cpu":
        print("real TPU required (pltpu PRNG has no CPU lowering)")
        return 1

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
    model, _ = get_count_network(200, A, max_count=3, use_ste=True,
                                 dtype=jnp.bfloat16)
    rngs = {"params": jax.random.PRNGKey(0),
            "gumbel": jax.random.PRNGKey(1)}
    params = model.init(rngs, jnp.zeros((8, image, image, 3)))["params"]

    x_cal = jnp.asarray(np.random.default_rng(42).normal(
        size=(64, image, image, 3)).astype(np.float32))
    act_scales = jax.device_get(jax.jit(
        lambda p, v: calibrate_act_scales(p, v, num_stages=7))(
            params["backbone"], x_cal))

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch, image, image, 3)).astype(np.float32))

    def make_step(ragged, inkpad, fusedhd):
        # GUMBEL_HEAD_PADDED is read at TRACE time inside
        # gumbel_hard_counts — set it before tracing each variant.
        os.environ["GUMBEL_HEAD_PADDED"] = "0" if ragged else "1"

        @jax.jit
        def step(params, x, seed):
            if fusedhd:
                counts = fused_block_convnext_apply(
                    params["backbone"], x, stride_threshold=100,
                    num_stages=7, act_scales=act_scales,
                    inkernel_pad=inkpad, gumbel_head={"seed": seed})
            else:
                feats = fused_block_convnext_apply(
                    params["backbone"], x, stride_threshold=100,
                    num_stages=7, act_scales=act_scales,
                    inkernel_pad=inkpad)
                counts = gumbel_hard_counts(feats, seed)
            return jnp.clip(jnp.round(counts), 0.0, 3.0)

        return step

    # Parity reference: plain flax backbone + XLA one-hot head under
    # injected noise (bench.py's regression check, shares no kernel code)
    small = x[:32]
    noise_key = jax.random.PRNGKey(9)

    @jax.jit
    def ref_counts(params, x):
        feats = model.backbone.apply(
            {"params": params["backbone"]}, x, deterministic=True)
        noise = jax.random.gumbel(noise_key, feats.shape, jnp.float32)
        y = feats.astype(jnp.float32) + noise
        onehot = jax.nn.one_hot(jnp.argmax(y, axis=-1), feats.shape[-1],
                                axis=-1)
        return jnp.clip(jnp.round(jnp.sum(onehot, axis=(1, 2))), 0.0, 3.0)

    c_ref = jax.device_get(ref_counts(params, small))
    feats_shape = (32, 26, 26, 768)
    noise = jax.random.gumbel(noise_key, feats_shape, jnp.float32)

    def parity(ragged, inkpad, fusedhd):
        os.environ["GUMBEL_HEAD_PADDED"] = "0" if ragged else "1"

        @jax.jit
        def counts_nz(params, x):
            if fusedhd:
                c = fused_block_convnext_apply(
                    params["backbone"], x, stride_threshold=100,
                    num_stages=7, act_scales=act_scales,
                    inkernel_pad=inkpad,
                    gumbel_head={"seed": 0, "noise": noise})
            else:
                feats = fused_block_convnext_apply(
                    params["backbone"], x, stride_threshold=100,
                    num_stages=7, act_scales=act_scales,
                    inkernel_pad=inkpad)
                c = gumbel_hard_counts(feats, 0, noise=noise)
            return jnp.clip(jnp.round(c), 0.0, 3.0)

        c_v = jax.device_get(counts_nz(params, small))
        agree = float(np.mean(c_v == c_ref))
        return agree

    results = {}
    print(f"{'variant':<28} {'ms/step':>8} {'img/s':>8} {'parity':>7}")
    for ragged, inkpad, fusedhd in itertools.product(
            [False, True], repeat=3):
        name = "+".join([n for n, on in
                         [("ragged", ragged), ("inkpad", inkpad),
                          ("fusedhd", fusedhd)] if on]) or "base"
        agree = parity(ragged, inkpad, fusedhd)
        step = make_step(ragged, inkpad, fusedhd)
        jax.device_get(step(params, x, 0))  # compile + warm
        jax.device_get(step(params, x, 0))
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for i in range(args.iters):
                c = step(params, x, i + 1)
            jax.device_get(c)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        ms = best * 1e3
        ips = batch / best
        results[name] = {"ms_per_step": round(ms, 2),
                         "imgs_per_sec": round(ips, 1),
                         "count_agree": round(agree, 4)}
        print(f"{name:<28} {ms:>8.2f} {ips:>8.1f} {agree:>7.4f}")

    import json
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
