"""Benchmark: Count-PIPNet inference throughput on one TPU chip.

Measures the BASELINE.json north-star metric: images/sec/chip for
Count-PIPNet inference (full convnext_tiny_26 backbone, CUB-200-scale:
200 classes, 224x224, bf16 compute) against the 5000 img/s/chip target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

BASELINE_IMGS_PER_SEC = 5000.0


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(__file__),
                                       ".jax_cache"))
    import jax
    import jax.numpy as jnp
    import numpy as np
    from count_pipnet_tpu.models import get_count_network
    from count_pipnet_tpu.utils.backend import wait_for_backend

    wait_for_backend()

    class Args:
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

    on_tpu = jax.devices()[0].platform != "cpu"
    batch = 256 if on_tpu else 8
    image = 224
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    model, _ = get_count_network(200, Args, max_count=3, use_ste=True,
                                 dtype=dtype)
    rngs = {"params": jax.random.PRNGKey(0),
            "gumbel": jax.random.PRNGKey(1)}
    x0 = jnp.zeros((batch, image, image, 3), jnp.float32)
    params = model.init(rngs, x0)["params"]

    if on_tpu:
        # Reference-parity inference forward (gumbel-hard head, clamped
        # counts, NonNeg classifier — count_pipnet.py:70-110 semantics)
        # on the whole-block Pallas backbone (one kernel per ConvNeXt
        # block, int8 MXU GEMMs in the wide stages) with the
        # on-core-PRNG gumbel-histogram head (BENCH_NOTES.md).
        from count_pipnet_tpu.models.quantized import (
            calibrate_act_scales, fused_block_convnext_apply,
        )
        from count_pipnet_tpu.ops.pallas.gumbel_head import \
            gumbel_hard_counts
        from count_pipnet_tpu.ops.ste import create_modified_encoding

        # Static activation scales: calibrated per-channel maxima folded
        # into the int8 weight quantization replace the per-row dynamic
        # lane-reduce (+4% end-to-end, BENCH_NOTES.md round 3; counts
        # agreement with the plain flax forward asserted below).
        x_cal = jnp.asarray(np.random.default_rng(42).normal(
            size=(64, image, image, 3)).astype(np.float32))
        act_scales = jax.device_get(jax.jit(
            lambda p, v: calibrate_act_scales(p, v, num_stages=7))(
                params["backbone"], x_cal))

        # Round-5 glue eliminations (BENCH_NOTES "Round 5", A/B'd by
        # scripts/bench_serving_glue.py: 93.5 -> 89.5 ms/step): padded
        # stages marshal the pad layout in VMEM (inkernel_pad) and the
        # final stage-4 block + gumbel-hard head run as ONE kernel, so
        # the last feature plane never touches HBM (gumbel_head=...).
        @jax.jit
        def _infer_seeded(params, x, seed):
            counts = fused_block_convnext_apply(
                params["backbone"], x, stride_threshold=100, num_stages=7,
                act_scales=act_scales, inkernel_pad=True,
                gumbel_head={"seed": seed})
            clamped = jnp.clip(jnp.round(counts), 0.0, 3.0)
            enc = create_modified_encoding(clamped, 3)
            enc = enc.reshape(enc.shape[0], -1)
            w = params["classification"]["weight"]
            out = enc @ jax.nn.relu(w).T
            return clamped, out

        def infer(params, x, rng):
            # plain int seed per step (a device round-trip here would
            # serialize the dispatch pipeline)
            seed = rng if isinstance(rng, int) else 0
            return _infer_seeded(params, x, seed)
    else:
        @jax.jit
        def infer(params, x, rng):
            proto, counts, out = model.apply(
                {"params": params}, x, inference=True, train=False,
                rngs={"gumbel": rng})
            return counts, out

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch, image, image, 3)).astype(np.float32))
    rng = jax.random.PRNGKey(2)

    # compile + warmup (fetch to host — on the remote-tunnel TPU backend,
    # block_until_ready alone does not guarantee remote completion)
    jax.device_get(infer(params, x, 0 if on_tpu else rng))
    jax.device_get(infer(params, x, 0 if on_tpu else rng))

    iters = 30 if on_tpu else 3
    # Optional device-side trace of the measured loop (VERDICT r4 item 3:
    # adjudicate the serving floor from device counters, not host timing).
    # Set BENCH_PROFILE_DIR=/tmp/prof to write an xplane trace; parse it
    # with scripts/xplane_report.py. Off by default — tracing adds host
    # overhead, so the printed number is only canonical without it.
    profile_dir = os.environ.get("BENCH_PROFILE_DIR", "")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    t0 = time.perf_counter()
    for i in range(iters):
        counts, out = infer(
            params, x, (i + 1) if on_tpu else jax.random.fold_in(rng, i))
    out_host = jax.device_get(out)  # forces the whole chain to completion
    dt = time.perf_counter() - t0
    if profile_dir:
        jax.profiler.stop_trace()
        print(f"# xplane trace written to {profile_dir}", file=sys.stderr)
    assert np.all(np.isfinite(out_host))

    if on_tpu:
        # Regression check (VERDICT r2 item 6): the int8 whole-block
        # backbone + Pallas gumbel-histogram head must reproduce the
        # PLAIN flax forward (unfused XLA backbone, one-hot argmax sum —
        # shares no code with the Pallas kernels) under IDENTICAL gumbel
        # noise, drawn once externally and fed to both paths.
        small = x[:32]
        noise_key = jax.random.PRNGKey(9)

        @jax.jit
        def _infer_flax_ref(params, x):
            feats = model.backbone.apply(
                {"params": params["backbone"]}, x, deterministic=True)
            noise = jax.random.gumbel(noise_key, feats.shape, jnp.float32)
            y = jax.nn.softmax(feats.astype(jnp.float32) + noise, axis=-1)
            onehot = jax.nn.one_hot(jnp.argmax(y, axis=-1),
                                    feats.shape[-1], axis=-1)
            counts = jnp.sum(onehot, axis=(1, 2))
            clamped = jnp.clip(jnp.round(counts), 0.0, 3.0)
            enc = create_modified_encoding(clamped, 3)
            enc = enc.reshape(enc.shape[0], -1)
            w = params["classification"]["weight"]
            return clamped, enc @ jax.nn.relu(w).T

        @jax.jit
        def _infer_int8_samenoise(params, x):
            noise = jax.random.gumbel(
                noise_key, (x.shape[0], 26, 26, 768), jnp.float32)
            counts = fused_block_convnext_apply(
                params["backbone"], x, stride_threshold=100, num_stages=7,
                act_scales=act_scales, inkernel_pad=True,
                gumbel_head={"seed": 0, "noise": noise})
            clamped = jnp.clip(jnp.round(counts), 0.0, 3.0)
            enc = create_modified_encoding(clamped, 3)
            enc = enc.reshape(enc.shape[0], -1)
            w = params["classification"]["weight"]
            return clamped, enc @ jax.nn.relu(w).T

        c_q, o_q = jax.device_get(_infer_int8_samenoise(params, small))
        c_r, o_r = jax.device_get(_infer_flax_ref(params, small))
        count_agree = float(np.mean(c_q == c_r))
        # top-1 of RANDOM-init weights is argmax over near-uniform logits
        # — pure tie-flip noise; assert the logits themselves instead
        # (with a trained model top-1 agreement follows from these two).
        logit_rel = float(np.abs(o_q - o_r).max()
                          / (np.abs(o_r).max() + 1e-9))
        assert count_agree > 0.99 and logit_rel < 0.05, (
            f"int8+pallas-head diverged from plain flax: "
            f"counts {count_agree}, logit rel err {logit_rel}")

        # Structural sanity of the on-core PRNG path (absorbed from
        # scripts/validate_gumbel_head.py): counts sum to the patch
        # count, same seed reproduces, different seed differs.
        feats_s = jnp.asarray(np.random.default_rng(1).normal(
            size=(8, 26, 26, 200)).astype(np.float32))
        gh = jax.jit(lambda v, s: gumbel_hard_counts(v, s))
        c1 = jax.device_get(gh(feats_s, 7))
        assert np.allclose(c1.sum(axis=1), 676.0)
        assert np.array_equal(c1, jax.device_get(gh(feats_s, 7)))
        assert not np.array_equal(c1, jax.device_get(gh(feats_s, 8)))

    imgs_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "count_pipnet_inference_throughput",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
