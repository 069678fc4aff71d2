"""Training-step timing: standard vs --fused_blocks vs --fused_whole_blocks.

Measures the full jitted train step (forward + custom-VJP STEs +
align/tanh/class losses + phase-masked AdamW + sparsity projection) at the
reference training shape (batch 64 two-view = 128 images, 224^2, bf16)
for each ConvNeXt block implementation, and checks the loss values agree.

Run alone on the real TPU (single claimer!):
    python scripts/bench_train_step.py [--batch 64] [--iters 5]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--image", type=int, default=224)
    ap.add_argument("--modes", nargs="*",
                    default=["standard", "fused_mlp", "whole_block"],
                    help="also: fused_mlp_dw (fused_mlp + Pallas dwconv "
                         "forward)")
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from count_pipnet_tpu.models import get_count_network
    from count_pipnet_tpu.train.optim import label_params, adamw_init
    from count_pipnet_tpu.train.steps import make_train_step

    B, IMG = args.batch, args.image
    rng0 = np.random.default_rng(0)
    xs1 = jnp.asarray(rng0.normal(size=(B, IMG, IMG, 3)).astype(np.float32))
    xs2 = jnp.asarray(rng0.normal(size=(B, IMG, IMG, 3)).astype(np.float32))
    ys = jnp.asarray(np.arange(B, dtype=np.int32) % 200)

    results = {}
    for mode in args.modes:
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
            fused_blocks = mode in ("fused_mlp", "fused_mlp_dw")
            fused_whole_blocks = mode == "whole_block"
            fused_dwconv = mode == "fused_mlp_dw"

        model, _ = get_count_network(200, A, max_count=3, use_ste=True,
                                     dtype=jnp.bfloat16)
        x0 = jnp.zeros((2 * B, IMG, IMG, 3), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "gumbel": jax.random.PRNGKey(1)}, x0)
        params = variables["params"]
        labels = label_params(params, A.net, use_mid_layers=False,
                              num_stages=7)
        opt_state = adamw_init(params)
        step = make_train_step(model, labels, is_count_pipnet=True,
                               enforce_weight_sparsity=True,
                               tanh_loss_coeff=0.01, weight_decay=0.0)
        lr = {k: jnp.float32(1e-4) for k in
              ("backbone", "to_freeze", "to_train", "add_on", "cls_weight",
               "cls_bias", "intermediate")}
        mask = {k: jnp.float32(1.0) for k in lr}
        sched = {"lr": lr, "mask": mask,
                 "align_w": jnp.float32(5.0), "tanh_w": jnp.float32(2.0),
                 "class_w": jnp.float32(2.0),
                 "pretrain": jnp.float32(0.0),
                 "finetune": jnp.float32(0.0),
                 "tau": jnp.float32(1.0), "project": jnp.float32(1.0)}
        rng = jax.random.PRNGKey(3)

        p, ms, o, metrics = step(params, {}, opt_state, (xs1, xs2, ys),
                                 rng, sched)
        loss0 = float(jax.device_get(metrics["loss"]))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            p, ms, o, metrics = step(p, ms, o, (xs1, xs2, ys), rng, sched)
        jax.device_get(metrics["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        results[mode] = (dt, loss0)
        print(f"{mode:12s}: {dt*1e3:7.1f} ms/step "
              f"({2*B/dt:6.0f} img/s) first-loss={loss0:.4f}", flush=True)

    if len(results) > 1:
        losses = [v[1] for v in results.values()]
        spread = max(losses) - min(losses)
        print(f"loss spread across modes: {spread:.4f} "
              f"({'OK' if spread < 0.05 else 'CHECK'})")


if __name__ == "__main__":
    main()
