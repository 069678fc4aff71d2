"""count_pipnet_tpu — a TPU-native (JAX/XLA/Pallas) framework for PIP-Net and
Count-PIPNet interpretable image classifiers.

Re-designed from scratch for TPU hardware with the same capabilities as the
PyTorch reference (TarasKutsyk/Count_PIPNet):

* functional flax models (NHWC, bf16 compute) instead of mutable nn.Modules
* `jax.custom_vjp` straight-through estimators instead of autograd.Functions
* a single jitted train step parameterized by runtime scalars (loss weights,
  learning rates, trainability masks) so phase changes never trigger recompiles
* data parallelism as `jax.sharding.NamedSharding` over a device mesh
* Pallas kernels for the fused prototype head on the inference hot path
"""

__version__ = "0.1.0"

# Honor an explicit JAX_PLATFORMS=cpu for every CLI/script that imports
# this package: a sitecustomize may force-register a remote single-claimer
# TPU backend and override jax_platforms through jax.config, ignoring the
# env var alone — a CPU-intended run would then silently contend for the
# TPU claim (and hang if another process holds it).
import os as _os

if _os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
