"""Measure the phase-DCE'd train steps vs the runtime-masked step.

For each training phase of the flagship config (pretrain / freeze /
finetune / unfrozen), times the compiled step with and without the
static frozen-label set (train/steps.py frozen_labels). Flagship shape:
full convnext_tiny_26, 224^2, 200 classes, batch 64 two-view,
--fused_blocks.

Run alone on the real TPU:  python scripts/bench_phase_dce.py
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

ALL_LABELS = ("backbone", "to_freeze", "to_train", "add_on",
              "cls_weight", "cls_bias", "intermediate")

PHASES = {
    # trainable label sets per phase (trainer.pretrain_masks/main_masks)
    "pretrain": {"to_train", "to_freeze", "add_on"},
    "freeze": {"to_train", "to_freeze", "add_on", "intermediate",
               "cls_weight", "cls_bias"},
    "finetune": {"cls_weight", "cls_bias", "intermediate"},
    "unfrozen": set(ALL_LABELS),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--image", type=int, default=224)
    ap.add_argument("--classes", type=int, default=200)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--stages", type=int, default=7,
                    help="backbone truncation (7 = flagship; lower for "
                         "CPU smoke tests)")
    ap.add_argument("--no_fused", action="store_true")
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from count_pipnet_tpu.models import get_count_network
    from count_pipnet_tpu.train.optim import label_params, adamw_init
    from count_pipnet_tpu.train.steps import make_train_step

    class MArgs:
        net = "convnext_tiny_26"
        num_features = 64
        use_mid_layers = args.stages < 7
        num_stages = args.stages
        bias = False
        activation = "gumbel_softmax"
        intermediate_layer = "onehot"
        positive_grad_strategy = None
        backward_clamp_strategy = "Identity"
        disable_pretrained = True
        fused_blocks = not args.no_fused
        dtype = "bfloat16"

    model, _ = get_count_network(args.classes, MArgs, max_count=5,
                                 use_ste=True, dtype=jnp.bfloat16)
    B, IMG = args.batch, args.image
    x0 = jnp.zeros((2, IMG, IMG, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "gumbel": jax.random.PRNGKey(1)}, x0)
    params = variables["params"]
    labels = label_params(params, MArgs.net,
                          use_mid_layers=MArgs.use_mid_layers,
                          num_stages=MArgs.num_stages)
    opt = adamw_init(params)

    rng0 = np.random.default_rng(0)
    xs1 = jnp.asarray(rng0.normal(size=(B, IMG, IMG, 3))
                      .astype(np.float32))
    xs2 = jnp.asarray(rng0.normal(size=(B, IMG, IMG, 3))
                      .astype(np.float32))
    ys = jnp.asarray((np.arange(B) % args.classes).astype(np.int32))
    key = jax.random.PRNGKey(7)

    def sched_for(trainable, pretrain, finetune):
        lr = {k: jnp.float32(1e-3) for k in ALL_LABELS}
        mask = {k: jnp.float32(1.0 if k in trainable else 0.0)
                for k in ALL_LABELS}
        return {"lr": lr, "mask": mask, "align_w": jnp.float32(5.0),
                "tanh_w": jnp.float32(2.0), "class_w": jnp.float32(2.0),
                "pretrain": jnp.float32(pretrain),
                "finetune": jnp.float32(finetune),
                "tau": jnp.float32(1.0),
                "project": jnp.float32(1.0 - pretrain)}

    def probe(tree):
        jax.device_get(jax.tree_util.tree_map(
            lambda t: t if getattr(t, "ndim", 0) == 0 else t.ravel()[:1],
            tree))

    def timeit(step, sched):
        r = step(params, {}, opt, (xs1, xs2, ys), key, sched)
        probe(r)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = step(params, {}, opt, (xs1, xs2, ys), key, sched)
        probe(r)
        return (time.perf_counter() - t0) / args.iters * 1e3

    base = make_train_step(model, labels, is_count_pipnet=True,
                           enforce_weight_sparsity=True,
                           tanh_loss_coeff=0.01, donate=False)

    print(f"batch {B} two-view, {IMG}^2, {args.classes} classes, "
          f"fused_blocks={MArgs.fused_blocks}")
    for name, trainable in PHASES.items():
        pre = 1.0 if name == "pretrain" else 0.0
        fin = 1.0 if name == "finetune" else 0.0
        sched = sched_for(trainable, pre, fin)
        t_mask = timeit(base, sched)
        frozen = frozenset(ALL_LABELS) - trainable | {"frozen"}
        dce = make_train_step(model, labels, is_count_pipnet=True,
                              enforce_weight_sparsity=True,
                              tanh_loss_coeff=0.01, donate=False,
                              frozen_labels=frozen)
        t_dce = timeit(dce, sched)
        print(f"{name:9s}: masked {t_mask:7.1f} ms   "
              f"DCE {t_dce:7.1f} ms   ({t_mask / t_dce:.2f}x)")


if __name__ == "__main__":
    main()
