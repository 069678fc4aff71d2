"""Serving-forward variants: whole-block int8 backbone knobs.

Times fused_block_convnext_apply (full 7-stage convnext_tiny_26, batch
256, 224^2) across knob settings and checks counts agreement between
them through the gumbel head at a fixed seed. Run alone on the TPU:

    python scripts/bench_serving_variants.py
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
    from count_pipnet_tpu.models.quantized import fused_block_convnext_apply
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

    variants = {
        "int8+ds_int8": dict(int8_min_dim=384, dw_bf16=False),
        "int8+ds_int8+dwbf16": dict(int8_min_dim=384, dw_bf16=True),
        "int8_no_ds": dict(int8_min_dim=10 ** 9, dw_bf16=False),
    }
    counts_by = {}
    for name, kw in variants.items():
        if name == "int8_no_ds":
            kw = dict(int8_min_dim=384, dw_bf16=False)
            # disable only the ds-int8 branch by raising its gate via a
            # huge min dim while keeping block int8: not expressible with
            # one knob -> time the pre-round-2 behavior instead by
            # skipping; kept for reference.
            continue

        @jax.jit
        def fwd(params, x, seed, _kw=tuple(sorted(kw.items()))):
            feats = fused_block_convnext_apply(
                params["backbone"], x, stride_threshold=100, num_stages=7,
                **dict(_kw))
            return gumbel_hard_counts(feats, seed)

        counts = jax.device_get(fwd(params, x, 7))
        t0 = time.perf_counter()
        for _ in range(20):
            r = fwd(params, x, 7)
        jax.device_get(r)
        dt = (time.perf_counter() - t0) / 20
        counts_by[name] = counts
        print(f"{name:22s}: {dt*1e3:7.2f} ms  ({B/dt:6.0f} img/s)",
              flush=True)

    names = list(counts_by)
    for other in names[1:]:
        agree = float(np.mean(counts_by[names[0]] == counts_by[other]))
        print(f"counts agreement {names[0]} vs {other}: {agree:.4f}")


if __name__ == "__main__":
    main()
