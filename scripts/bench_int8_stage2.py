"""Probe: int8 pointwise GEMMs below C=384 + batch-512 grid amortization.

Round-2 gated int8 at ``int8_min_dim=384`` because dynamic per-row
quantization cost ~0.9 ms/block of VPU time and the MXU rate gain is
smaller at narrow widths. The round-3 static-scale path replaced the
dynamic quant with one broadcast multiply, so the break-even width may
have moved: this measures the full 7-stage convnext_tiny_26 backbone
(whole-block serving path, static calibrated scales) at
``int8_min_dim`` in {384, 192, 96} and batch in {256, 512}, plus the
counts-agreement of each variant against the int8_min_dim=384 control.

Run alone on the TPU:  python scripts/bench_int8_stage2.py
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

    model, _ = get_count_network(200, Args, max_count=3, use_ste=True,
                                 dtype=jnp.bfloat16)
    rngs = {"params": jax.random.PRNGKey(0),
            "gumbel": jax.random.PRNGKey(1)}
    x0 = jnp.zeros((8, 224, 224, 3), jnp.float32)
    params = model.init(rngs, x0)["params"]
    xc = jnp.asarray(np.random.default_rng(42).normal(
        size=(64, 224, 224, 3)).astype(np.float32))

    t0 = time.perf_counter()
    scales = jax.device_get(jax.jit(
        lambda p, v: calibrate_act_scales(p, v, num_stages=7))(
            params["backbone"], xc))
    print(f"calibration: {time.perf_counter()-t0:.1f} s", flush=True)

    def make_fwd(min_dim, scales):
        @jax.jit
        def fwd(params, x, seed):
            feats = fused_block_convnext_apply(
                params["backbone"], x, stride_threshold=100, num_stages=7,
                int8_min_dim=min_dim, act_scales=scales)
            return gumbel_hard_counts(feats, seed)
        return fwd

    # Pipelined timing (bench.py pattern): dispatch `iters` steps, fetch
    # once at the end — per-call device_get serializes the remote-tunnel
    # dispatch pipeline and adds ~44 ms of round-trip per call.
    for B in (256, 512):
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(B, 224, 224, 3)).astype(np.float32))
        ref_counts = None
        for min_dim in (384, 192, 96):
            fn = make_fwd(min_dim, scales)
            counts = jax.device_get(fn(params, x, 7))
            if ref_counts is None:
                ref_counts = counts
                agree = 1.0
            else:
                agree = float((counts.argmax(-1) ==
                               ref_counts.argmax(-1)).mean())
            iters = 20
            jax.device_get(fn(params, x, 0))
            t0 = time.perf_counter()
            for i in range(iters):
                out = fn(params, x, 7 + i)
            jax.device_get(out)
            dt = (time.perf_counter() - t0) / iters
            print(f"B={B} int8_min_dim={min_dim}: {dt*1e3:.2f} ms, "
                  f"{B/dt:.0f} img/s, argmax-agree-vs-384={agree:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
