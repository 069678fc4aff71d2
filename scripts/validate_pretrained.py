"""Pretrained-checkpoint converter validation kit.

This environment has no torchvision and no egress, so no REAL ImageNet /
iNat tensor has ever passed through the weight converters
(ACCURACY.md) — they are validated against synthetic state dicts only
(tests/test_weight_convert.py, tests/test_torch_golden.py). The moment a
real checkpoint file is reachable, this script closes that gap in one
invocation:

    python scripts/validate_pretrained.py \
        --checkpoint /path/to/convnext_tiny-983f1562.pth \
        --arch convnext_tiny [--num_stages 7] [--save-goldens out.npz]

    python scripts/validate_pretrained.py \
        --checkpoint /path/to/BBN.iNaturalist2017....pth \
        --arch resnet50 --inat

It performs, in order:
  1. tensor-level conversion COVERAGE: every source tensor must be
     consumed (or intentionally skipped: fc.*, rb_block, num_batches_
     tracked) and every target leaf filled, with exact shape agreement
     against a fresh flax init;
  2. SENTINEL ROUND-TRIP: the converter re-runs on a state dict whose
     i-th consumed tensor is constant-filled with value i (skipped
     tensors with -1); since the converters only transpose/reshape,
     every leaf element must equal some consumed tensor's sentinel and
     every sentinel must surface — catching dropped/duplicated tensors
     and skip-list leaks; plus (convnext) an INDEPENDENT forward
     computed directly from torchvision-named tensors, bypassing the
     converter — agreement with the converted-flax forward catches
     same-shape permutations that no accounting check can;
  3. forward parity vs the live torch reference feature extractor
     (reference features/convnext_features.py:38-65 /
     resnet_features.py:231-328) — runs when torchvision is importable,
     else prints the exact skip reason;
  4. our flax forward on a deterministic input, with feature statistics
     printed and optionally saved as a goldens .npz (so a later
     torch-capable host can diff without re-running JAX).

Reference loading contract: features/convnext_features.py:38-65 and
features/resnet_features.py:231-328 (pretrained weight ingestion).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


SKIP_SUBSTRINGS = ("num_batches_tracked",)
SKIP_PREFIXES = ("fc.", "classifier.", "head.")


def load_state_dict(path):
    import torch
    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        obj = torch.load(path, map_location="cpu")
    for key in ("state_dict", "model", "model_state_dict"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    if not isinstance(obj, dict):
        raise SystemExit(f"checkpoint {path} is not a state dict "
                         f"(got {type(obj)})")
    return {k: v for k, v in obj.items()}


def flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def check_coverage(sd, params, batch_stats=None, inat=False,
                   extra_skip=None):
    """1:1 accounting of source tensors vs converted leaves."""
    src = {}
    for k, v in sd.items():
        if any(s in k for s in SKIP_SUBSTRINGS):
            continue
        if any(k.startswith(p) for p in SKIP_PREFIXES):
            continue
        if extra_skip is not None and extra_skip(k):
            continue
        if inat:
            if not k.startswith("module.backbone.") or "rb_block" in k:
                continue
        src[k] = np.asarray(v.detach().cpu().numpy()
                            if hasattr(v, "detach") else v)
    leaves = flatten(params)
    if batch_stats:
        leaves.update(flatten(batch_stats, "batch_stats"))
    n_src = sum(v.size for v in src.values())
    n_dst = sum(v.size for v in leaves.values())
    print(f"  source tensors: {len(src)} ({n_src:,} params)")
    print(f"  converted leaves: {len(leaves)} ({n_dst:,} params)")
    if n_src != n_dst:
        print(f"  !! element-count mismatch: {n_src - n_dst:+,} — "
              f"some source tensors were not mapped")
    return src, leaves, n_src == n_dst


def check_sentinel_roundtrip(convert, sd, inat=False, extra_skip=None):
    """Source<->leaf accounting at the VALUE level, no torch needed.

    Re-runs the converter on a sentinel state dict where the i-th
    consumed source tensor is constant-filled with value i and every
    intentionally-skipped tensor with -1. The converters only
    transpose / reshape / slice (models/convnext.py, models/resnet.py),
    so every element of every converted leaf must equal SOME consumed
    tensor's sentinel, every consumed sentinel must appear in some leaf,
    and no skipped sentinel may leak through. Catches dropped,
    duplicated, or value-transformed tensors and skip-list leaks. It
    canNOT catch a consistent permutation between same-shaped tensors
    (both sentinels still surface somewhere) — that is what the
    independent direct-from-state-dict forward below is for.
    """
    sent, consumed = {}, {}
    idx = 0
    for k, v in sd.items():
        arr = np.asarray(v.detach().cpu().numpy()
                         if hasattr(v, "detach") else v)
        skip = (any(s in k for s in SKIP_SUBSTRINGS)
                or any(k.startswith(p) for p in SKIP_PREFIXES)
                or (extra_skip is not None and extra_skip(k))
                or (inat and (not k.startswith("module.backbone.")
                              or "rb_block" in k)))
        if skip:
            sent[k] = np.full(arr.shape, -1.0, np.float32)
        else:
            idx += 1
            sent[k] = np.full(arr.shape, float(idx), np.float32)
            consumed[k] = float(idx)
    out = convert(sent)
    params, stats = out if isinstance(out, tuple) else (out, None)
    leaves = flatten(params)
    if stats:
        leaves.update(flatten(stats, "batch_stats"))
    expected = set(consumed.values())
    seen, ok = set(), True
    for name, leaf in leaves.items():
        vals = set(np.unique(np.asarray(leaf, np.float32)).tolist())
        bad = vals - expected
        if bad:
            print(f"  !! leaf {name} holds values from no consumed source "
                  f"(or from a skipped one): {sorted(bad)[:4]}")
            ok = False
        seen |= vals & expected
    unseen = expected - seen
    if unseen:
        names = [k for k, i in consumed.items() if i in unseen]
        print(f"  !! {len(unseen)} consumed source tensors never reach "
              f"any converted leaf: {names[:4]}")
        ok = False
    print(f"  sentinel round-trip ({idx} sources -> {len(leaves)} leaves): "
          f"{'OK' if ok else 'FAILED'}")
    return ok


def forward_from_sd_convnext(sd, x, num_stages, stride_threshold=100):
    """Backbone features computed DIRECTLY from torchvision-named
    tensors, bypassing the converter entirely.

    An independent implementation of the reference's surgically-modified
    convnext_tiny (reference features/convnext_features.py:17-65;
    torchvision naming: features.0 stem, features.{odd}.{j}.block.*
    CNBlocks, features.{even}.{0,1} downsample LN+conv; stride-2 convs
    with in_channels > stride_threshold run at stride 1). Agreement with
    the converted-flax forward proves the converter wired every tensor
    to the right layer — the mis-mapping class (same-shape permutations)
    that coverage / sentinel / shape checks cannot see.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    def g(k):
        v = sd[k]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else v
        return jnp.asarray(np.asarray(v), jnp.float32)

    def conv(h, pre, stride, groups=1, pad="VALID"):
        w = jnp.transpose(g(f"{pre}.weight"), (2, 3, 1, 0))
        y = lax.conv_general_dilated(
            h, w, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups)
        return y + g(f"{pre}.bias")

    def ln(h, pre, eps=1e-6):
        m = h.mean(-1, keepdims=True)
        v = ((h - m) ** 2).mean(-1, keepdims=True)
        return (h - m) / jnp.sqrt(v + eps) * g(f"{pre}.weight") \
            + g(f"{pre}.bias")

    h = conv(jnp.asarray(x, jnp.float32), "features.0.0", 4)
    h = ln(h, "features.0.1")
    stage_blocks = {1: 3, 3: 3, 5: 9, 7: 3}
    for i in range(1, min(num_stages, 7) + 1):
        if i % 2 == 1:
            for j in range(stage_blocks[i]):
                pre = f"features.{i}.{j}.block"
                dim = h.shape[-1]
                y = conv(h, f"{pre}.0", 1, groups=dim,
                         pad=((3, 3), (3, 3)))
                y = ln(y, f"{pre}.2")
                y = y @ g(f"{pre}.3.weight").T + g(f"{pre}.3.bias")
                y = jax.nn.gelu(y, approximate=False)
                y = y @ g(f"{pre}.5.weight").T + g(f"{pre}.5.bias")
                y = y * g(f"features.{i}.{j}.layer_scale").reshape(-1)
                h = h + y
        else:
            in_ch = h.shape[-1]
            stride = 1 if in_ch > stride_threshold else 2
            h = ln(h, f"features.{i}.0")
            h = conv(h, f"features.{i}.1", stride)
    return np.asarray(h, np.float32)


def check_shapes_vs_init(model, converted, example_shape, extra_init=None):
    """Converted tree must be congruent with a fresh init of the model."""
    import jax
    import jax.numpy as jnp
    x0 = jnp.zeros(example_shape, jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0)
    ref = flatten(variables["params"])
    got = flatten(converted)
    missing = sorted(set(ref) - set(got))
    extra = sorted(set(got) - set(ref))
    bad = [(k, ref[k].shape, got[k].shape)
           for k in set(ref) & set(got) if ref[k].shape != got[k].shape]
    for k in missing:
        print(f"  !! missing converted leaf: {k} {ref[k].shape}")
    for k in extra:
        print(f"  !! unexpected converted leaf: {k} {got[k].shape}")
    for k, a, b in bad:
        print(f"  !! shape mismatch {k}: init {a} vs converted {b}")
    ok = not (missing or extra or bad)
    print(f"  structural check vs fresh init: {'OK' if ok else 'FAILED'}")
    return ok, variables


def forward_ours(model, converted, batch_stats, x):
    import jax.numpy as jnp
    variables = {"params": converted}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    feats = model.apply(variables, jnp.asarray(x), deterministic=True)
    return np.asarray(feats, np.float32)


def try_torch_parity(arch, sd, x, feats_ours, num_stages, inat):
    """Live-parity against the reference feature extractor, if possible."""
    try:
        import torchvision  # noqa: F401
    except ImportError as e:
        print(f"  torch-parity SKIPPED: torchvision unavailable ({e}); "
              f"structural + round-trip checks above still hold. Re-run "
              f"on a torchvision-capable host to close forward parity.")
        return None
    import importlib.util
    import torch
    ref_dir = os.environ.get("REFERENCE_DIR", "/root/reference")
    rel = ("features/convnext_features.py" if arch.startswith("convnext")
           else "features/resnet_features.py")
    path = os.path.join(ref_dir, rel)
    if not os.path.exists(path):
        print(f"  torch-parity SKIPPED: reference module missing ({path})")
        return None
    spec = importlib.util.spec_from_file_location("_ref_features", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_features"] = mod
    spec.loader.exec_module(mod)
    if arch.startswith("convnext"):
        net = mod.convnext_tiny_26_features(pretrained=False)
        missing, unexpected = net.load_state_dict(
            {f"features.{k}" if not k.startswith("features") else k: v
             for k, v in sd.items()}, strict=False)
        print(f"  reference load: missing={len(missing)} "
              f"unexpected={len(unexpected)}")
    else:
        # For the BBN iNat checkpoint, target the reference's dedicated
        # extractor (resnet_features.py:273-301) and apply the same key
        # remap convert_torch_resnet does — the raw 'module.backbone.*'
        # keys would all land as 'unexpected' and leave the torch net
        # randomly initialized, making parity vacuously DIVERGED.
        fn_name = f"{arch}_features_inat" if inat else f"{arch}_features"
        fn = getattr(mod, fn_name, None) or getattr(mod, f"{arch}_features")
        net = fn(pretrained=False)
        tsd = {}
        for k, v in sd.items():
            if inat:
                if not k.startswith("module.backbone."):
                    continue
                k = k[len("module.backbone."):]
                if "rb_block" in k:
                    continue
                k = k.replace("cb_block", "layer4.2")
            if k.startswith("fc."):
                continue
            tsd[k] = v
        missing, unexpected = net.load_state_dict(tsd, strict=False)
        print(f"  reference load: missing={len(missing)} "
              f"unexpected={len(unexpected)}")
        if len(tsd) and len(unexpected) >= len(tsd):
            print("  !! no source tensor matched the reference net — "
                  "parity result would be meaningless")
            return False
    net.eval()
    with torch.no_grad():
        t = net(torch.tensor(np.moveaxis(x, -1, 1)))  # NHWC -> NCHW
    theirs = np.moveaxis(t.numpy(), 1, -1)
    diff = np.abs(theirs - feats_ours)
    rel = diff.max() / (np.abs(theirs).max() + 1e-9)
    print(f"  forward parity vs reference torch: max abs "
          f"{diff.max():.3e}, rel {rel:.3e} "
          f"({'OK' if rel < 1e-3 else 'DIVERGED'})")
    return rel < 1e-3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--arch", required=True,
                    choices=["convnext_tiny", "resnet18", "resnet34",
                             "resnet50", "resnet101", "resnet152"])
    ap.add_argument("--num_stages", type=int, default=7)
    ap.add_argument("--inat", action="store_true",
                    help="BBN iNaturalist checkpoint key remap")
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--save-goldens", default=None)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")

    sd = load_state_dict(args.checkpoint)
    print(f"[1/4] loaded {args.checkpoint}: {len(sd)} tensors")

    if args.arch == "convnext_tiny":
        from count_pipnet_tpu.models.convnext import (
            ConvNeXtFeatures, convert_torchvision_convnext,
        )

        def convert(s):
            return convert_torchvision_convnext(
                s, num_stages=args.num_stages)

        # Stages beyond --num_stages are truncated by design (reference
        # convnext_features.py:17-36); their tensors are intentionally
        # unconsumed by the converter.
        kept = {0} | set(range(1, min(args.num_stages, 7) + 1))

        def truncated(k):
            parts = k.split(".")
            return (parts[0] == "features" and parts[1].isdigit()
                    and int(parts[1]) not in kept)

        converted = convert(sd)
        batch_stats = None
        model = ConvNeXtFeatures(num_stages=args.num_stages)
        extra_skip = truncated
    else:
        from count_pipnet_tpu.models import resnet as R
        specs = {"resnet18": ((2, 2, 2, 2), False),
                 "resnet34": ((3, 4, 6, 3), False),
                 "resnet50": ((3, 4, 6, 3), True),
                 "resnet101": ((3, 4, 23, 3), True),
                 "resnet152": ((3, 8, 36, 3), True)}
        layers, bottleneck = specs[args.arch]

        def convert(s):
            return R.convert_torch_resnet(
                s, layers, bottleneck=bottleneck, inat=args.inat)

        converted, batch_stats = convert(sd)
        model = R.ResNetFeatures(
            R.Bottleneck if bottleneck else R.BasicBlock, layers)
        extra_skip = None

    print("[2/4] conversion coverage + sentinel round-trip:")
    _, _, cov_ok = check_coverage(sd, converted, batch_stats,
                                  inat=args.inat, extra_skip=extra_skip)
    rt_ok = check_sentinel_roundtrip(convert, sd, inat=args.inat,
                                 extra_skip=extra_skip)
    shape = (1, args.image_size, args.image_size, 3)
    ok, _ = check_shapes_vs_init(model, converted, shape)

    print("[3/4] forward on deterministic input:")
    x = np.random.default_rng(0).normal(size=shape).astype(np.float32)
    feats = forward_ours(model, converted, batch_stats, x)
    print(f"  features {feats.shape}: mean {feats.mean():+.4f} "
          f"std {feats.std():.4f} absmax {np.abs(feats).max():.4f} "
          f"finite={np.isfinite(feats).all()}")
    indep_ok = True
    if args.arch == "convnext_tiny":
        indep = forward_from_sd_convnext(sd, x, args.num_stages)
        d = np.abs(indep - feats)
        rel = d.max() / (np.abs(indep).max() + 1e-9)
        indep_ok = bool(rel < 1e-4)
        print(f"  independent direct-from-state-dict forward: max abs "
              f"{d.max():.3e}, rel {rel:.3e} "
              f"({'OK' if indep_ok else 'MISWIRED'})")

    print("[4/4] live torch forward parity:")
    parity = try_torch_parity(args.arch, sd, x, feats,
                              args.num_stages, args.inat)

    if args.save_goldens:
        np.savez_compressed(args.save_goldens, input=x, features=feats,
                            arch=args.arch, num_stages=args.num_stages)
        print(f"goldens saved to {args.save_goldens}")

    sys.exit(0 if (cov_ok and rt_ok and ok and indep_ok
                   and parity is not False
                   and np.isfinite(feats).all()) else 1)


if __name__ == "__main__":
    main()
