"""Render original vs two-view augmented samples for eyeballing.

Reference: tests/visualize_augmented_datasamples.py — sanity-check the
augmentation recipes per dataset by rendering a grid of (original, view1,
view2) triples.

Usage:
    python scripts/visualize_augmented_samples.py --dataset geometric_shapes \
        --image_size 64 --out aug_samples.png [--n 4]
"""

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def denormalize(arr):
    from count_pipnet_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD
    arr = arr * np.asarray(IMAGENET_STD) + np.asarray(IMAGENET_MEAN)
    return Image.fromarray(
        (np.clip(arr, 0, 1) * 255).astype(np.uint8))


def main():
    ap = argparse.ArgumentParser("Visualize augmented data samples")
    ap.add_argument("--dataset", default="geometric_shapes")
    ap.add_argument("--image_size", type=int, default=192)
    ap.add_argument("--basepath", default="./")
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="aug_samples.png")
    args = ap.parse_args()

    class A:
        dataset = args.dataset
        image_size = args.image_size
        validation_size = 0.0
        seed = args.seed

    from count_pipnet_tpu.data.registry import get_data
    (trainset, _pre, _normal, _aug, projectset, *_rest) = get_data(
        A, args.basepath)

    cell = 128
    rng = random.Random(args.seed)
    rows = []
    for i in range(args.n):
        idx = rng.randrange(len(trainset))
        v1, v2, y = trainset[(idx, random.Random(args.seed * 1000 + i))]
        orig, _ = projectset[(idx if len(projectset) > idx else 0,
                              random.Random(0))]
        rows.append([denormalize(orig).resize((cell, cell)),
                     denormalize(v1).resize((cell, cell)),
                     denormalize(v2).resize((cell, cell)), y])

    grid = Image.new("RGB", (3 * cell, args.n * cell), "white")
    for r, (o, a, b, y) in enumerate(rows):
        grid.paste(o, (0, r * cell))
        grid.paste(a, (cell, r * cell))
        grid.paste(b, (2 * cell, r * cell))
    grid.save(args.out)
    print(f"original | view1 | view2 grid -> {args.out}")


if __name__ == "__main__":
    main()
