"""Static (calibrated) vs dynamic int8 activation quantization.

The whole-block serving kernel's dynamic per-row quantization costs a
lane reduce + divide per GEMM input (~0.9 ms/block of VPU time at stage
3, BENCH_NOTES.md round 3). The static mode calibrates per-channel
activation maxima once (models/quantized.py:calibrate_act_scales), folds
them into the weight quantization, and quantizes with one broadcast
multiply. This script measures both paths end-to-end (full 7-stage
convnext_tiny_26, batch 256, 224^2) and checks counts/logit agreement of
the static path against the PLAIN flax bf16 forward under identical
gumbel noise (the bench.py round-2 parity bar).

Run alone on the TPU:  python scripts/bench_static_scales.py
"""

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
    import jax
    import jax.numpy as jnp
    import numpy as np
    from count_pipnet_tpu.models import get_count_network
    from count_pipnet_tpu.models.quantized import (
        calibrate_act_scales, fused_block_convnext_apply,
    )
    from count_pipnet_tpu.ops.pallas.gumbel_head import gumbel_hard_counts

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

    B = 256
    model, _ = get_count_network(200, Args, max_count=3, use_ste=True,
                                 dtype=jnp.bfloat16)
    rngs = {"params": jax.random.PRNGKey(0),
            "gumbel": jax.random.PRNGKey(1)}
    x0 = jnp.zeros((B, 224, 224, 3), jnp.float32)
    params = model.init(rngs, x0)["params"]
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(B, 224, 224, 3)).astype(np.float32))
    # calibration batch: DIFFERENT draw than the measurement batch
    xc = jnp.asarray(np.random.default_rng(42).normal(
        size=(64, 224, 224, 3)).astype(np.float32))

    t0 = time.perf_counter()
    scales = jax.device_get(jax.jit(
        lambda p, v: calibrate_act_scales(p, v, num_stages=7))(
            params["backbone"], xc))
    print(f"calibration ({len(scales)} blocks): "
          f"{time.perf_counter()-t0:.1f} s", flush=True)

    def make_fwd(act_scales):
        @jax.jit
        def fwd(params, x, seed):
            feats = fused_block_convnext_apply(
                params["backbone"], x, stride_threshold=100, num_stages=7,
                act_scales=act_scales)
            return gumbel_hard_counts(feats, seed)
        return fwd

    results = {}
    for name, fn in [("dynamic", make_fwd(None)),
                     ("static", make_fwd(scales))]:
        counts = jax.device_get(fn(params, x, 7))
        t0 = time.perf_counter()
        for _ in range(20):
            r = fn(params, x, 7)
        jax.device_get(r)
        dt = (time.perf_counter() - t0) / 20
        results[name] = counts
        print(f"{name:8s}: {dt*1e3:7.2f} ms  ({B/dt:6.0f} img/s)",
              flush=True)

    agree = float(np.mean(results["dynamic"] == results["static"]))
    print(f"counts agreement dynamic vs static: {agree:.4f}")

    # bench.py-bar parity: static path vs plain flax forward, same noise
    small = x[:32]
    noise_key = jax.random.PRNGKey(9)

    @jax.jit
    def ref_counts(params, x):
        feats = model.backbone.apply(
            {"params": params["backbone"]}, x, deterministic=True)
        noise = jax.random.gumbel(noise_key, feats.shape, jnp.float32)
        y = jax.nn.softmax(feats.astype(jnp.float32) + noise, axis=-1)
        onehot = jax.nn.one_hot(jnp.argmax(y, axis=-1), feats.shape[-1],
                                axis=-1)
        return jnp.sum(onehot, axis=(1, 2))

    @jax.jit
    def static_counts(params, x):
        feats = fused_block_convnext_apply(
            params["backbone"], x, stride_threshold=100, num_stages=7,
            act_scales=scales)
        noise = jax.random.gumbel(noise_key, feats.shape, jnp.float32)
        return gumbel_hard_counts(feats, 0, noise=noise)

    c_r = jax.device_get(ref_counts(params, small))
    c_s = jax.device_get(static_counts(params, small))
    print(f"counts agreement static vs plain-flax (same noise): "
          f"{float(np.mean(c_r == c_s)):.4f}")


if __name__ == "__main__":
    main()
