"""Device mesh and sharding rules — the TPU-native replacement for the
reference's ``nn.DataParallel`` (reference main.py:118, the repo's only
device-parallel mechanism; SURVEY.md §2/§5).

Design: pure data parallelism expressed as a 1-D ``jax.sharding.Mesh`` over
the 'data' axis. Inputs are batch-sharded, parameters/optimizer state are
replicated, and XLA's SPMD partitioner inserts the gradient all-reduce over
ICI — no hand-written collectives. Multi-host extends this by initializing
``jax.distributed`` and feeding each host its local shard (the loader already
yields host-local batches); the sharding annotations below are unchanged.
"""



import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh", "batch_sharding", "replicated_sharding", "shard_batch",
    "replicate", "local_device_count",
]


def local_device_count() -> int:
    return len(jax.devices())


def make_mesh(n_devices: int = -1, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices
    (-1 = all)."""
    devs = jax.devices()
    if n_devices == -1:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(
            f"requested mesh of {n_devices} devices but only "
            f"{len(devs)} available")
    return Mesh(np.asarray(devs[:n_devices]), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a host batch (pytree of arrays, leading dim = batch) onto the
    mesh, sharded over the batch dimension."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
