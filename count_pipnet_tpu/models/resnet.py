"""ResNet feature extractors, TPU-native (flax/linen, NHWC).

Capability parity with the reference's hand-written ResNet
(reference: features/resnet_features.py): avgpool/fc removed, and — the key
modification — **layer3 and layer4 run at stride 1** (reference
resnet_features.py:152-154) so a 224 input yields a 28x28 latent grid
(conv1 s2 -> maxpool s2 -> layer2 s2 = /8).

Variants: resnet18/34 (BasicBlock), resnet50/101/152 (Bottleneck), plus the
iNaturalist-pretrained resnet50 whose checkpoint key remap lives in
:func:`convert_torch_resnet` (reference resnet_features.py:273-301).

BatchNorm uses flax's ``batch_stats`` collection; pass ``use_running_average``
via the ``deterministic`` flag (train mode updates running stats, like torch).
"""

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

__all__ = [
    "ResNetFeatures",
    "resnet18_features", "resnet34_features", "resnet50_features",
    "resnet101_features", "resnet152_features", "resnet50_features_inat",
    "convert_torch_resnet",
]

kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def _bn(dtype, name):
    return nn.BatchNorm(epsilon=1e-5, momentum=0.9, dtype=dtype, name=name)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32
    expansion = 1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, kernel_init=kaiming,
                    name="conv1")(x)
        h = _bn(self.dtype, "bn1")(h, use_running_average=not train)
        h = nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, kernel_init=kaiming, name="conv2")(h)
        h = _bn(self.dtype, "bn2")(h, use_running_average=not train)
        if self.has_downsample:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride,
                        use_bias=False, dtype=self.dtype, kernel_init=kaiming,
                        name="downsample_conv")(x)
            x = _bn(self.dtype, "downsample_bn")(
                x, use_running_average=not train)
        return nn.relu(x + h)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32
    expansion = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=kaiming, name="conv1")(x)
        h = _bn(self.dtype, "bn1")(h, use_running_average=not train)
        h = nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, kernel_init=kaiming,
                    name="conv2")(h)
        h = _bn(self.dtype, "bn2")(h, use_running_average=not train)
        h = nn.relu(h)
        h = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=kaiming, name="conv3")(h)
        h = _bn(self.dtype, "bn3")(h, use_running_average=not train)
        if self.has_downsample:
            x = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                        use_bias=False, dtype=self.dtype, kernel_init=kaiming,
                        name="downsample_conv")(x)
            x = _bn(self.dtype, "downsample_bn")(
                x, use_running_average=not train)
        return nn.relu(x + h)


class ResNetFeatures(nn.Module):
    """ResNet trunk without avgpool/fc; layer3+layer4 at stride 1."""

    block_cls: type = BasicBlock
    layers: Sequence[int] = (2, 2, 2, 2)
    dtype: Any = jnp.float32
    # Per-layer strides — the reference's interpretability modification
    # (resnet_features.py:152-154): layer1 s1, layer2 s2, layer3 s1, layer4 s1
    layer_strides: Sequence[int] = (1, 2, 1, 1)

    @property
    def out_channels(self) -> int:
        return 512 * self.block_cls.expansion

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        train = not deterministic
        h = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, kernel_init=kaiming, name="conv1")(x)
        h = _bn(self.dtype, "bn1")(h, use_running_average=not train)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        inplanes = 64
        for layer_idx, (planes, n_blocks, stride) in enumerate(
            zip((64, 128, 256, 512), self.layers, self.layer_strides), start=1
        ):
            for b in range(n_blocks):
                s = stride if b == 0 else 1
                needs_ds = b == 0 and (
                    s != 1 or inplanes != planes * self.block_cls.expansion)
                h = self.block_cls(
                    planes, stride=s, has_downsample=needs_ds,
                    dtype=self.dtype, name=f"layer{layer_idx}_block_{b}",
                )(h, train=train)
                inplanes = planes * self.block_cls.expansion
        return h


def resnet18_features(dtype=jnp.float32):
    return ResNetFeatures(BasicBlock, (2, 2, 2, 2), dtype=dtype)


def resnet34_features(dtype=jnp.float32):
    return ResNetFeatures(BasicBlock, (3, 4, 6, 3), dtype=dtype)


def resnet50_features(dtype=jnp.float32):
    return ResNetFeatures(Bottleneck, (3, 4, 6, 3), dtype=dtype)


def resnet101_features(dtype=jnp.float32):
    return ResNetFeatures(Bottleneck, (3, 4, 23, 3), dtype=dtype)


def resnet152_features(dtype=jnp.float32):
    return ResNetFeatures(Bottleneck, (3, 8, 36, 3), dtype=dtype)


def resnet50_features_inat(dtype=jnp.float32):
    """Same trunk; pretrained weights come from the BBN iNaturalist-2017
    checkpoint via convert_torch_resnet(..., inat=True) which performs the
    cb_block/rb_block -> layer4.2 key remap (reference
    resnet_features.py:273-301)."""
    return ResNetFeatures(Bottleneck, (3, 4, 6, 3), dtype=dtype)


# ---------------------------------------------------------------------------
# torch -> flax weight conversion
# ---------------------------------------------------------------------------
def convert_torch_resnet(state_dict, layers, bottleneck=True, inat=False):
    """Convert a torchvision/BBN ResNet state_dict to this module's
    (params, batch_stats) variable collections.

    ``fc.*`` keys are ignored (the reference pops them,
    resnet_features.py:237-239). With ``inat=True``, BBN keys are remapped
    first: 'module.backbone.' prefix stripped, 'cb_block' -> 'layer4.2',
    'rb_block' dropped (reference resnet_features.py:273-301).
    """
    import numpy as np

    def as_np(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v)

    sd = {}
    for k, v in state_dict.items():
        if inat:
            if not k.startswith("module.backbone."):
                continue
            k = k[len("module.backbone."):]
            if "rb_block" in k:
                continue
            k = k.replace("cb_block", "layer4.2")
        if k.startswith("fc."):
            continue
        sd[k] = as_np(v)

    def conv_w(w):
        return np.transpose(w, (2, 3, 1, 0))

    params, stats = {}, {}

    def put_bn(tkey, scope, name):
        params.setdefault(scope, {})[name] = {
            "scale": sd[f"{tkey}.weight"], "bias": sd[f"{tkey}.bias"]}
        stats.setdefault(scope, {})[name] = {
            "mean": sd[f"{tkey}.running_mean"],
            "var": sd[f"{tkey}.running_var"]}

    params["conv1"] = {"kernel": conv_w(sd["conv1.weight"])}
    put_bn("bn1", "__root__", "bn1")
    # flatten the root-level bn back out
    params["bn1"] = params.pop("__root__")["bn1"]
    stats["bn1"] = stats.pop("__root__")["bn1"]

    n_convs = 3 if bottleneck else 2
    for li, n_blocks in enumerate(layers, start=1):
        for b in range(n_blocks):
            scope = f"layer{li}_block_{b}"
            tpre = f"layer{li}.{b}"
            params[scope] = {}
            stats[scope] = {}
            for c in range(1, n_convs + 1):
                params[scope][f"conv{c}"] = {
                    "kernel": conv_w(sd[f"{tpre}.conv{c}.weight"])}
                params[scope][f"bn{c}"] = {
                    "scale": sd[f"{tpre}.bn{c}.weight"],
                    "bias": sd[f"{tpre}.bn{c}.bias"]}
                stats[scope][f"bn{c}"] = {
                    "mean": sd[f"{tpre}.bn{c}.running_mean"],
                    "var": sd[f"{tpre}.bn{c}.running_var"]}
            if f"{tpre}.downsample.0.weight" in sd:
                params[scope]["downsample_conv"] = {
                    "kernel": conv_w(sd[f"{tpre}.downsample.0.weight"])}
                params[scope]["downsample_bn"] = {
                    "scale": sd[f"{tpre}.downsample.1.weight"],
                    "bias": sd[f"{tpre}.downsample.1.bias"]}
                stats[scope]["downsample_bn"] = {
                    "mean": sd[f"{tpre}.downsample.1.running_mean"],
                    "var": sd[f"{tpre}.downsample.1.running_var"]}

    import jax
    params = jax.tree_util.tree_map(jnp.asarray, params)
    stats = jax.tree_util.tree_map(jnp.asarray, stats)
    return params, stats
