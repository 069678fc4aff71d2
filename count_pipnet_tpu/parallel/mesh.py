"""Device mesh and sharding rules — the TPU-native replacement for the
reference's ``nn.DataParallel`` (reference main.py:118, the repo's only
device-parallel mechanism; SURVEY.md §2/§5).

Design: pure data parallelism expressed as a 1-D ``jax.sharding.Mesh`` over
the 'data' axis. Inputs are batch-sharded, parameters/optimizer state are
replicated, and XLA's SPMD partitioner inserts the gradient all-reduce over
ICI — no hand-written collectives.

Multi-host (DCN): parallel/distributed.py initializes ``jax.distributed``;
``make_mesh`` then spans all GLOBAL devices, and ``shard_batch`` /
``replicate`` assemble global arrays from process-local data. Because the
loader is deterministic per (seed, epoch, index), every host materializes
the identical global batch and contributes its own ``host_batch_slice`` —
no cross-host data exchange is needed. Tested by tests/test_multihost.py
(a real 2-process x 4-device CPU cluster).
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
    """Place a GLOBAL host batch (pytree of arrays, leading dim = batch)
    onto the mesh, sharded over the batch dimension.

    Multi-process: every host loads the identical global batch (the
    loader is deterministic in (seed, epoch, index)); this host keeps its
    ``host_batch_slice`` and the global array is assembled from the
    process-local shards."""
    sh = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        from .distributed import host_batch_slice

        def put(x):
            x = np.asarray(x)
            lo, hi = host_batch_slice(x.shape[0])
            return jax.make_array_from_process_local_data(sh, x[lo:hi])

        return jax.tree_util.tree_map(put, batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sh = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
