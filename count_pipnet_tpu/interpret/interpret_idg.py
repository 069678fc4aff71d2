"""Config-driven saliency attribution for trained runs.

Reference: util/interpret_idg.py — a GLOBAL_CFG-driven script (:46-99) that
loads a trained run from its pickled args + checkpoint
(load_model_for_interpretation :138-180), wraps the model to expose logits
(PIPNetWrapper :112-119) or pooled counts (PIPNetPrototypeWrapper :121-135)
as attribution targets, selects active prototypes above a threshold with
virtual-weight scaling (:337-369), runs IG / LeftIG / IDG per prototype,
and additively blends colored attribution overlays (:396+); plus a
whole-dataset logit-attribution mode (interpret_logits_for_dataset :587).
"""

import os
import pickle
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..data import augment as A
from ..models.pipnet import (
    get_pipnet, get_count_network, CountPIPNet, importance_per_class,
)
from ..utils.checkpoint import CheckpointManager
from .saliency import IG, IDG, guided_ig, visualize_grayscale

__all__ = ["GLOBAL_CFG", "load_model_for_interpretation",
           "make_logit_fn", "make_prototype_fn", "interpret",
           "interpret_logits_for_dataset"]

# Default configuration (reference interpret_idg.py:46-99)
GLOBAL_CFG: Dict = {
    "run_dir": "",                 # trained run directory (with metadata/)
    "checkpoint": "net_best",      # which checkpoint role to load
    "method": "IDG",               # IG | LIG | IDG | GIG
    "steps": 128,
    "batch_size": 32,
    "alpha_star": 0.33,            # LeftIG cutoff
    "baseline": 0.0,
    "prototype_threshold": 0.1,    # min weighted activation to attribute
    "images_per_class": 2,         # random sampling mode
    "seed": 0,
    "output_dir": "idg_attributions",
    "overlay_alpha": 0.6,
}

# distinct RGB colors for per-prototype overlay blending
_COLORS = np.asarray([
    (228, 26, 28), (55, 126, 184), (77, 175, 74), (152, 78, 163),
    (255, 127, 0), (255, 255, 51), (166, 86, 40), (247, 129, 191),
    (153, 153, 153), (0, 200, 200), (100, 0, 200), (200, 200, 0),
], dtype=np.float32)


def load_model_for_interpretation(run_dir: str, checkpoint="net_best",
                                  dtype=jnp.float32):
    """Rebuild a trained model from its saved args + checkpoint
    (reference interpret_idg.py:138-180).

    Returns (model, params, batch_stats, args).
    """
    args_path = os.path.join(run_dir, "metadata", "args.pickle")
    with open(args_path, "rb") as f:
        args = pickle.load(f)
    args.log_dir = run_dir

    num_classes = getattr(args, "num_classes", None)
    if num_classes is None:
        # infer from checkpoint classifier shape after load
        num_classes = 0

    if getattr(args, "model", "pipnet") == "count_pipnet":
        builder = lambda n: get_count_network(
            n, args, max_count=getattr(args, "max_count", 3),
            use_ste=getattr(args, "use_ste", False), dtype=dtype)
    else:
        builder = lambda n: get_pipnet(n, args, dtype=dtype)

    ckpt = CheckpointManager(args)
    res = (ckpt.load_best_checkpoint() if checkpoint == "net_best"
           else ckpt.load_trained_checkpoint(name=checkpoint))
    if res is None:
        raise FileNotFoundError(
            f"no '{checkpoint}' checkpoint under {run_dir}")
    state, _meta = res
    if not num_classes:
        num_classes = state["params"]["classification"]["weight"].shape[0]
    model, _ = builder(num_classes)
    params = jax.tree_util.tree_map(jnp.asarray, state["params"])
    batch_stats = jax.tree_util.tree_map(
        jnp.asarray, state.get("batch_stats", {}) or {})
    return model, params, batch_stats, args


def make_logit_fn(model, params, batch_stats, tau=1.0, rng=None):
    """[B,H,W,C] -> [B, num_classes] logits (reference PIPNetWrapper)."""
    model_state = {"batch_stats": batch_stats} if batch_stats else {}
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    def fn(xs):
        _, _, out = model.apply(
            {"params": params, **model_state}, xs, inference=True,
            train=False, tau=tau, rngs={"gumbel": rng})
        return out.astype(jnp.float32)

    return fn


def make_prototype_fn(model, params, batch_stats, prototype_idx, tau=1.0,
                      rng=None):
    """[B,H,W,C] -> [B] pooled activation of one prototype
    (reference PIPNetPrototypeWrapper)."""
    model_state = {"batch_stats": batch_stats} if batch_stats else {}
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    def fn(xs):
        _, pooled, _ = model.apply(
            {"params": params, **model_state}, xs, inference=True,
            train=False, tau=tau, rngs={"gumbel": rng})
        return pooled[:, prototype_idx].astype(jnp.float32)

    return fn


def _weighted_activations(model, params, pooled, class_idx):
    """Per-prototype weighted activation for a class: virtual weights for
    Count-PIPNet, raw classifier weights otherwise
    (reference interpret_idg.py:337-366)."""
    if isinstance(model, CountPIPNet):
        bound = model.bind({"params": params})
        w = np.asarray(importance_per_class(bound, params))
    else:
        w = np.asarray(params["classification"]["weight"])
    return pooled * w[class_idx]


def _attribute(method, cfg, x, fn):
    if method == "IG":
        return IG(x, fn, steps=cfg["steps"], batch_size=cfg["batch_size"],
                  alpha_star=1.0, baseline=cfg["baseline"])
    if method == "LIG":
        return IG(x, fn, steps=cfg["steps"], batch_size=cfg["batch_size"],
                  alpha_star=cfg["alpha_star"], baseline=cfg["baseline"])
    if method == "IDG":
        return IDG(x, fn, steps=cfg["steps"], batch_size=cfg["batch_size"],
                   baseline=cfg["baseline"])
    if method == "GIG":
        return guided_ig(x, fn, steps=min(cfg["steps"], 64),
                         baseline=cfg["baseline"])
    raise ValueError(f"unknown attribution method {method}")


def interpret_prototypes(model, params, batch_stats, img: Image.Image,
                         args, cfg=None, rng=None):
    """Attribute each sufficiently-active prototype on one image and blend
    colored overlays (reference interpret_idg.py:337-470).

    Returns (overlay PIL image, {prototype: attribution map}).
    """
    cfg = dict(GLOBAL_CFG, **(cfg or {}))
    rng = rng if rng is not None else jax.random.PRNGKey(cfg["seed"])
    img_size = args.image_size
    normalize = A.Compose([A.Resize(img_size), A.ToArray(), A.Normalize()])
    x = normalize(img, None)[None].astype(np.float32)

    logit_fn = make_logit_fn(model, params, batch_stats, rng=rng)
    out = np.asarray(logit_fn(jnp.asarray(x)))[0]
    pred = int(out.argmax())

    model_state = {"batch_stats": batch_stats} if batch_stats else {}
    _, pooled, _ = model.apply(
        {"params": params, **model_state}, jnp.asarray(x), inference=True,
        train=False, rngs={"gumbel": rng})
    pooled = np.asarray(pooled)[0]

    weighted = _weighted_activations(model, params, pooled, pred)
    active = np.where(weighted > cfg["prototype_threshold"])[0]

    attributions = {}
    blended = np.zeros((img_size, img_size, 3), np.float32)
    for j, p in enumerate(active):
        fn = make_prototype_fn(model, params, batch_stats, int(p), rng=rng)
        attr = _attribute(cfg["method"], cfg, x, fn)
        gray = visualize_grayscale(attr)
        color = _COLORS[j % len(_COLORS)] / 255.0
        blended += gray[..., None] * color[None, None, :]
        attributions[int(p)] = attr

    blended = np.clip(blended, 0, 1)
    base = np.asarray(
        img.convert("RGB").resize((img_size, img_size)), np.float32) / 255.0
    alpha = cfg["overlay_alpha"]
    overlay = np.clip((1 - alpha) * base + alpha * blended, 0, 1)
    overlay_img = Image.fromarray((overlay * 255).astype(np.uint8))
    return overlay_img, attributions


def interpret(cfg=None):
    """Config-driven entry (reference interpret_idg.py:207): sample
    images_per_class images per class from the run's projection set and
    attribute their active prototypes."""
    cfg = dict(GLOBAL_CFG, **(cfg or {}))
    model, params, batch_stats, args = load_model_for_interpretation(
        cfg["run_dir"], cfg["checkpoint"])

    from ..data.registry import get_data
    (_, _, _, _, projectset, _, _, classes, _, _, _) = get_data(args)

    base = getattr(projectset, "base", projectset)
    by_class: Dict[int, List[int]] = {}
    for i, t in enumerate(base.targets):
        by_class.setdefault(t, []).append(i)

    out_dir = os.path.join(args.log_dir, cfg["output_dir"])
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(cfg["seed"])
    for cls_idx, idxs in sorted(by_class.items()):
        chosen = rng.choice(idxs, size=min(cfg["images_per_class"],
                                          len(idxs)), replace=False)
        for i in chosen:
            path = base.imgs[i][0]
            img = Image.open(path).convert("RGB")
            overlay, attrs = interpret_prototypes(
                model, params, batch_stats, img, args, cfg)
            name = os.path.splitext(os.path.basename(path))[0]
            overlay.save(os.path.join(
                out_dir, f"{classes[cls_idx]}_{name}_{cfg['method']}.png"))
            print(f"attributed {path}: {len(attrs)} active prototypes",
                  flush=True)
    print(f"Attribution overlays saved to {out_dir}", flush=True)


def interpret_logits_for_dataset(cfg=None, max_images=50):
    """Logit-target attribution over a dataset sample
    (reference interpret_idg.py:587)."""
    cfg = dict(GLOBAL_CFG, **(cfg or {}))
    model, params, batch_stats, args = load_model_for_interpretation(
        cfg["run_dir"], cfg["checkpoint"])
    from ..data.registry import get_data
    (_, _, _, _, projectset, _, _, classes, _, _, _) = get_data(args)
    base = getattr(projectset, "base", projectset)

    out_dir = os.path.join(args.log_dir, cfg["output_dir"] + "_logits")
    os.makedirs(out_dir, exist_ok=True)
    normalize = A.Compose([A.Resize(args.image_size), A.ToArray(),
                           A.Normalize()])
    logit_fn = make_logit_fn(model, params, batch_stats)
    for i in range(min(max_images, len(base.imgs))):
        path = base.imgs[i][0]
        img = Image.open(path).convert("RGB")
        x = normalize(img, None)[None].astype(np.float32)
        pred = int(np.asarray(logit_fn(jnp.asarray(x)))[0].argmax())
        attr = _attribute(cfg["method"], cfg, x,
                          lambda xs: logit_fn(xs)[:, pred])
        gray = visualize_grayscale(attr)
        Image.fromarray((gray * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"{i}_{classes[pred]}.png"))
    print(f"Logit attributions saved to {out_dir}", flush=True)


def _cli():
    """Runnable-script parity with the reference (its interpret_idg.py is
    executed directly with GLOBAL_CFG edited in place; here the config
    keys are CLI flags)."""
    import argparse

    ap = argparse.ArgumentParser(
        "Prototype/logit saliency attribution for a trained run")
    ap.add_argument("--run_dir", type=str, required=True)
    ap.add_argument("--checkpoint", type=str,
                    default=GLOBAL_CFG["checkpoint"])
    ap.add_argument("--method", type=str, default=GLOBAL_CFG["method"],
                    choices=["IG", "LIG", "IDG", "GIG"])
    ap.add_argument("--steps", type=int, default=GLOBAL_CFG["steps"])
    ap.add_argument("--images_per_class", type=int,
                    default=GLOBAL_CFG["images_per_class"])
    ap.add_argument("--prototype_threshold", type=float,
                    default=GLOBAL_CFG["prototype_threshold"])
    ap.add_argument("--output_dir", type=str,
                    default=GLOBAL_CFG["output_dir"])
    ap.add_argument("--seed", type=int, default=GLOBAL_CFG["seed"])
    ap.add_argument("--mode", type=str, default="prototypes",
                    choices=["prototypes", "logits"])
    ap.add_argument("--max_images", type=int, default=50,
                    help="logits mode: dataset images to attribute")
    cli = ap.parse_args()

    cfg = dict(GLOBAL_CFG)
    for k in ("run_dir", "checkpoint", "method", "steps",
              "images_per_class", "prototype_threshold", "output_dir",
              "seed"):
        cfg[k] = getattr(cli, k)
    cfg["batch_size"] = min(cfg["batch_size"], cli.steps)
    if cli.mode == "prototypes":
        interpret(cfg)
    else:
        interpret_logits_for_dataset(cfg, max_images=cli.max_images)


if __name__ == "__main__":
    import os as _os
    if _os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    _cli()
