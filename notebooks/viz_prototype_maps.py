"""Prototype-map visualization for a finished run.

Script analogue of the reference's ``notebooks/viz_prototype_maps.ipynb``:
reload a trained run from its saved args + best checkpoint, rebuild the
projection loader, and render the full prototype visualization tree —
top-k patch grids plus the rich feature-map artifacts (original+rect,
side-by-side heatmap, masked overlay, count debug txt).

Usage:
    python notebooks/viz_prototype_maps.py --run_dir ./runs/<run> \
        [--checkpoint net_best] [--out_folder viz_prototype_maps] [--k 10]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# honor JAX_PLATFORMS=cpu even when a sitecustomize force-registers a
# remote TPU backend (it overrides the env var via jax.config)
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    import jax
    jax.config.update("jax_platforms", "cpu")


class _TrainerShim:
    """The minimal trainer surface vizualize_network needs."""

    def __init__(self, model, params, batch_stats, tau=1.0):
        self.model = model
        self.params = params
        self.batch_stats = batch_stats
        self.tau = tau


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", type=str, required=True)
    ap.add_argument("--checkpoint", type=str, default="net_best")
    ap.add_argument("--out_folder", type=str,
                    default="viz_prototype_maps")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--max_maps", type=int, default=3)
    args = ap.parse_args()

    from count_pipnet_tpu.interpret.interpret_idg import (
        load_model_for_interpretation,
    )
    from count_pipnet_tpu.interpret.vis_pipnet import vizualize_network
    from count_pipnet_tpu.data.registry import get_dataloaders

    model, params, batch_stats, run_args = load_model_for_interpretation(
        args.run_dir, args.checkpoint)
    loaders = get_dataloaders(run_args)
    projectloader, classes = loaders[4], loaders[-1]

    shim = _TrainerShim(model, params, batch_stats)
    topks = vizualize_network(
        shim, projectloader, len(classes), args.out_folder, run_args,
        k=args.k, are_pretraining_prototypes=False,
        plot_histograms=False, visualize_prototype_maps=True,
        plot_topk=True, max_feature_maps_per_prototype=args.max_maps)
    out = os.path.join(run_args.log_dir, args.out_folder)
    print(f"{len(topks)} prototypes rendered under {out}")


if __name__ == "__main__":
    main()
