"""Gradient-based effective receptive field analysis of the backbone.

Reference: tests/receptive_field_analysis.py — computes the effective
receptive field of the (stride-modified) ConvNeXt at several stage depths by
backpropagating from the center latent position to the input, and saves
heatmap PNGs. The resulting ERF sizes justify the shapes-generator object
sizes (reference util/generate_shapes_data.py:34-38).

Usage:
    JAX_PLATFORMS=cpu python scripts/receptive_field_analysis.py \
        [--stages 3 5 7] [--image_size 192] [--out_dir ./receptive_field_viz]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def effective_receptive_field(num_stages, image_size, n_samples=8, seed=0):
    import jax
    import jax.numpy as jnp
    from count_pipnet_tpu.models import convnext_tiny_26_features

    model = convnext_tiny_26_features(num_stages=num_stages)
    x0 = jnp.zeros((1, image_size, image_size, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x0)["params"]

    def center_activation(x):
        y = model.apply({"params": params}, x)
        h, w = y.shape[1] // 2, y.shape[2] // 2
        return jnp.sum(y[:, h, w, :])

    grad_fn = jax.jit(jax.grad(center_activation))
    rng = np.random.default_rng(seed)
    acc = np.zeros((image_size, image_size), np.float64)
    for _ in range(n_samples):
        x = jnp.asarray(rng.normal(size=(1, image_size, image_size, 3))
                        .astype(np.float32))
        g = np.abs(np.asarray(grad_fn(x)))[0].sum(axis=-1)
        acc += g
    acc /= acc.max() + 1e-12

    # ERF size: width of the region holding 95% of gradient mass around
    # the center row/col
    def mass_width(profile):
        profile = profile / (profile.sum() + 1e-12)
        center = len(profile) // 2
        total = 0.0
        r = 0
        while total < 0.95 and r < center:
            lo, hi = center - r, center + r + 1
            total = profile[lo:hi].sum()
            r += 1
        return 2 * r

    width = mass_width(acc.sum(axis=0))
    height = mass_width(acc.sum(axis=1))
    return acc, (height, width)


def main():
    ap = argparse.ArgumentParser("Effective receptive field analysis")
    ap.add_argument("--stages", type=int, nargs="+", default=[3, 5, 7])
    ap.add_argument("--image_size", type=int, default=192)
    ap.add_argument("--out_dir", default="./receptive_field_viz")
    ap.add_argument("--samples", type=int, default=8)
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(args.out_dir, exist_ok=True)
    for stages in args.stages:
        erf, (h, w) = effective_receptive_field(
            stages, args.image_size, n_samples=args.samples)
        fig, ax = plt.subplots(figsize=(5, 5))
        ax.imshow(erf, cmap="inferno")
        ax.set_title(f"ERF @ {stages} stages: ~{h}x{w}px (95% mass)")
        fig.tight_layout()
        path = os.path.join(args.out_dir, f"erf_stages_{stages}.png")
        fig.savefig(path, dpi=120)
        plt.close(fig)
        print(f"stages={stages}: effective receptive field ~{h}x{w}px "
              f"-> {path}", flush=True)


if __name__ == "__main__":
    main()
