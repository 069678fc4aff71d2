"""Per-image prediction explanations.

Reference: util/visualize_prediction.py (vis_pred :19-100,
vis_pred_experiments :102-169). For a handful of test images per class, for
the top-3 predicted classes, saves per-prototype patch crops and
rectangle-overlay images named
``mul{sim*w:.3f}_p{idx}_sim{sim:.3f}_w{w:.3f}_patch.png`` / ``_rect.png``
for contributions with |sim x weight| > 0.01.

The reference's OpenCV JET heatmap branch is dead code (its cv2 import is
commented out, visualize_prediction.py:12-17); here heatmaps are produced
with matplotlib's jet colormap instead, always available.
"""

import os


import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image, ImageDraw

from ..data import augment as A
from ..models.pipnet import CountPIPNet, importance_per_class
from ..utils.func import get_patch_size
from .vis_pipnet import get_img_coordinates

__all__ = ["vis_pred", "vis_pred_experiments"]


def _prediction_fn(model, params, batch_stats, tau):
    model_state = {"batch_stats": batch_stats} if batch_stats else {}

    @jax.jit
    def run(xs, rng):
        proto, pooled, out = model.apply(
            {"params": params, **model_state}, xs, inference=True,
            train=False, tau=tau, rngs={"gumbel": rng})
        return (proto.astype(jnp.float32), pooled.astype(jnp.float32),
                out.astype(jnp.float32))

    return run


def _explain_image(model, params, run, img_path, img_size, out_root,
                   classes, rng, save_heatmaps=False, top_classes=3):
    normalize = A.Compose([A.Resize(img_size), A.ToArray(), A.Normalize()])
    img = Image.open(img_path).convert("RGB").resize(
        (img_size, img_size), Image.BILINEAR)
    xs = normalize(Image.open(img_path).convert("RGB"), None)[None]
    proto, pooled, out = jax.device_get(run(jnp.asarray(xs), rng))
    proto, pooled, out = proto[0], pooled[0], out[0]

    if isinstance(model, CountPIPNet):
        bound = model.bind({"params": params})
        weights = np.asarray(importance_per_class(bound, params))  # [C, P]
    else:
        weights = np.asarray(params["classification"]["weight"])

    h, w, num_p = proto.shape
    latent_shape = (num_p, h, w)
    patchsize, skip = get_patch_size(img_size, w)

    order = np.argsort(-out)[:top_classes]
    img_name = os.path.splitext(os.path.basename(img_path))[0]
    for rank, c in enumerate(order):
        cname = classes[c] if classes and c < len(classes) else str(c)
        cdir = os.path.join(
            out_root, img_name,
            f"{rank}_{cname}_output{out[c]:.3f}")
        for p in range(num_p):
            sim = float(pooled[p])
            wt = float(weights[c, p])
            mul = abs(sim * wt)
            if mul <= 0.01:
                continue
            os.makedirs(cdir, exist_ok=True)
            hw = int(np.argmax(proto[:, :, p]))
            h_idx, w_idx = hw // w, hw % w
            h0, h1, w0, w1 = get_img_coordinates(
                img_size, latent_shape, patchsize, skip, h_idx, w_idx)
            stem = f"mul{mul:.3f}_p{p}_sim{sim:.3f}_w{wt:.3f}"
            img.crop((w0, h0, w1, h1)).save(
                os.path.join(cdir, stem + "_patch.png"))
            rect = img.copy()
            ImageDraw.Draw(rect).rectangle([w0, h0, w1, h1],
                                           outline=(255, 255, 0), width=2)
            rect.save(os.path.join(cdir, stem + "_rect.png"))
            if save_heatmaps:
                import matplotlib
                matplotlib.use("Agg")
                import matplotlib.cm as cm
                pm = proto[:, :, p]
                pm = pm / (pm.max() + 1e-8)
                heat = cm.jet(np.asarray(Image.fromarray(
                    (pm * 255).astype(np.uint8)).resize(
                        (img_size, img_size), Image.BILINEAR)) / 255.0)
                heat_img = Image.fromarray(
                    (heat[..., :3] * 255).astype(np.uint8))
                Image.blend(img, heat_img, 0.5).save(
                    os.path.join(cdir, stem + "_heatmap.png"))


def vis_pred(trainer, test_dir, classes, args, n_per_class=5,
             save_heatmaps=False):
    """Explain up to n_per_class test images per class
    (reference visualize_prediction.py:19-100)."""
    model = trainer.model
    params = jax.device_get(trainer.params)
    batch_stats = jax.device_get(trainer.batch_stats) \
        if getattr(trainer, "batch_stats", None) else {}
    run = _prediction_fn(model, params, batch_stats,
                         getattr(trainer, "tau", 1.0))
    out_root = os.path.join(args.log_dir, args.dir_for_saving_images)
    rng = jax.random.PRNGKey(11)

    for cls in sorted(os.listdir(test_dir)):
        cdir = os.path.join(test_dir, cls)
        if not os.path.isdir(cdir):
            continue
        files = sorted(os.listdir(cdir))[:n_per_class]
        for fname in files:
            rng, sub = jax.random.split(rng)
            _explain_image(model, params, run,
                           os.path.join(cdir, fname), args.image_size,
                           out_root, classes, sub,
                           save_heatmaps=save_heatmaps)
    print(f"Prediction explanations saved under {out_root}", flush=True)


def vis_pred_experiments(trainer, experiments_dir, classes, args,
                         save_heatmaps=False):
    """Explain every image in an OOD/extra folder, all classes
    (reference visualize_prediction.py:102-169)."""
    model = trainer.model
    params = jax.device_get(trainer.params)
    batch_stats = jax.device_get(trainer.batch_stats) \
        if getattr(trainer, "batch_stats", None) else {}
    run = _prediction_fn(model, params, batch_stats,
                         getattr(trainer, "tau", 1.0))
    out_root = os.path.join(args.log_dir,
                            args.dir_for_saving_images + "_experiments")
    rng = jax.random.PRNGKey(13)
    for dirpath, _dirs, files in os.walk(experiments_dir):
        for fname in sorted(files):
            if not fname.lower().endswith(
                    (".png", ".jpg", ".jpeg", ".bmp")):
                continue
            rng, sub = jax.random.split(rng)
            _explain_image(model, params, run,
                           os.path.join(dirpath, fname), args.image_size,
                           out_root, classes, sub,
                           save_heatmaps=save_heatmaps)
    print(f"Experiment explanations saved under {out_root}", flush=True)
