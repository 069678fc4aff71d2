"""Training-step decomposition: where do the 243.8 ms go?

Measures, at the flagship training shape (batch 64 two-view = 128
images, 224^2, bf16, --fused_blocks):

  1. backbone-only forward and forward+backward per ``num_stages``
     truncation (1, 3, 5, 7) — successive differences give per-stage
     fwd / fwd+bwd marginal costs (the serving-marginals trick of
     scripts/bench_fused_marginals.py applied to training);
  2. full loss forward, loss grad, and the complete train step
     (losses + STE chain + AdamW + projection) — the head/loss and
     optimizer overheads by difference;
  3. optionally the same with the dwconv kernel behind stop_gradient
     (kills the XLA depthwise wgrad) to bound that component.

Run alone on the real TPU:  python scripts/bench_train_marginals.py
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
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--image", type=int, default=224)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--stages", nargs="*", type=int, default=[1, 3, 5, 7])
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from count_pipnet_tpu.models.convnext import convnext_tiny_26_features

    B, IMG = args.batch, args.image
    rng0 = np.random.default_rng(0)
    x = jnp.asarray(rng0.normal(size=(B, IMG, IMG, 3)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def probe(tree):
        # fetch one element per leaf (forces remote completion without
        # hauling whole grad trees through the tunnel)
        jax.device_get(jax.tree_util.tree_map(
            lambda t: t if getattr(t, "ndim", 0) == 0 else t.ravel()[:1],
            tree))

    def timeit(f, *a, iters=args.iters):
        probe(f(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(*a)
        probe(r)
        return (time.perf_counter() - t0) / iters

    prev_f = prev_g = 0.0
    for ns in args.stages:
        net = convnext_tiny_26_features(num_stages=ns, dtype=jnp.bfloat16,
                                        stochastic_depth_prob=0.0,
                                        fused_mlp=True)
        params = net.init(jax.random.PRNGKey(0), x[:1])["params"]

        fwd = jax.jit(lambda p, v: net.apply({"params": p}, v,
                                             deterministic=True))

        def loss(p, v):
            return jnp.sum(net.apply({"params": p}, v,
                                     deterministic=True)
                           .astype(jnp.float32)) * 1e-6

        gradf = jax.jit(jax.grad(loss))
        t_f = timeit(fwd, params, x)
        t_g = timeit(gradf, params, x)
        print(f"backbone ns={ns}: fwd {t_f*1e3:7.2f} ms "
              f"(marginal {(t_f-prev_f)*1e3:7.2f})   fwd+bwd "
              f"{t_g*1e3:7.2f} ms (marginal {(t_g-prev_g)*1e3:7.2f})",
              flush=True)
        prev_f, prev_g = t_f, t_g

    # full-model pieces at ns=7 (mirrors scripts/bench_train_step.py)
    from count_pipnet_tpu.models import get_count_network
    from count_pipnet_tpu.train.optim import label_params, adamw_init
    from count_pipnet_tpu.train.steps import make_train_step

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
        fused_blocks = True
        fused_whole_blocks = False

    model, _ = get_count_network(200, A, max_count=3, use_ste=True,
                                 dtype=jnp.bfloat16)
    half = B // 2
    xs1 = x[:half].astype(jnp.float32)
    xs2 = x[half:].astype(jnp.float32)
    ys = jnp.asarray(np.arange(half, dtype=np.int32) % 200)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "gumbel": jax.random.PRNGKey(1)},
        jnp.zeros((B, IMG, IMG, 3), jnp.float32))
    params = variables["params"]
    labels = label_params(params, A.net, use_mid_layers=False,
                          num_stages=7)
    opt_state = adamw_init(params)
    step = make_train_step(model, labels, is_count_pipnet=True,
                           enforce_weight_sparsity=True,
                           tanh_loss_coeff=0.01, weight_decay=0.0,
                           donate=False)
    lr = {k: jnp.float32(1e-4) for k in
          ("backbone", "to_freeze", "to_train", "add_on", "cls_weight",
           "cls_bias", "intermediate")}
    mask = {k: jnp.float32(1.0) for k in lr}
    sched = {"lr": lr, "mask": mask,
             "align_w": jnp.float32(5.0), "tanh_w": jnp.float32(2.0),
             "class_w": jnp.float32(2.0),
             "pretrain": jnp.float32(0.0), "finetune": jnp.float32(0.0),
             "tau": jnp.float32(1.0), "project": jnp.float32(1.0)}
    rng = jax.random.PRNGKey(3)

    def run_step(p, o):
        return step(p, {}, o, (xs1, xs2, ys), rng, sched)[3]["loss"]

    t_step = timeit(run_step, params, opt_state, iters=args.iters)
    print(f"full train step (fused_mlp, two-view batch {half}): "
          f"{t_step*1e3:7.2f} ms  "
          f"(backbone fwd+bwd alone was {prev_g*1e3:7.2f})", flush=True)


if __name__ == "__main__":
    main()
