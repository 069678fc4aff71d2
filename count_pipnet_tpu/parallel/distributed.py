"""Multi-host (multi-process) data parallelism over DCN.

The reference has no distributed backend at all — its only multi-device
mechanism is single-process ``nn.DataParallel`` (reference main.py:118,
documented untested beyond one GPU at main.py:75). SURVEY.md §5 defines
the TPU-native story this module implements:

* ``jax.distributed.initialize`` connects the per-host processes (one
  process per TPU host; DCN between hosts, ICI inside a slice);
* the mesh spans ALL global devices; parameters stay replicated and
  gradients all-reduce exactly as in the single-process path
  (parallel/mesh.py) — XLA partitions over ICI/DCN automatically;
* each host loads only its own slice of the global batch
  (``host_batch_slice``) and ``shard_host_local_batch`` assembles the
  global batch-sharded array from the process-local shards via
  ``jax.make_array_from_process_local_data``.

Single-process use is a no-op: ``maybe_initialize`` only initializes when
the standard env vars (or explicit args) describe a multi-process run, so
every entry point can call it unconditionally.
"""

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "maybe_initialize", "is_distributed", "global_mesh",
    "host_batch_slice", "shard_host_local_batch", "process_index",
    "process_count",
]

_INITIALIZED = False


def maybe_initialize(coordinator_address=None, num_processes=None,
                     process_id=None, local_device_ids=None) -> bool:
    """Initialize ``jax.distributed`` when a multi-process run is
    described — by explicit arguments or by the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).

    Returns True when running (or now initialized) multi-process, False
    for plain single-process runs. Safe to call more than once.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if not coordinator_address or num_processes is None or \
            num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id,
        local_device_ids=local_device_ids)
    _INITIALIZED = True
    return True


def is_distributed() -> bool:
    return jax.process_count() > 1


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def global_mesh(axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over ALL global devices (every process must
    build the identical mesh)."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def host_batch_slice(global_batch: int, pid=None, pcount=None):
    """This host's (start, stop) slice of the global batch.

    The global batch must divide evenly across processes — uneven batches
    would desynchronize the SPMD program across hosts.
    """
    pid = jax.process_index() if pid is None else pid
    pcount = jax.process_count() if pcount is None else pcount
    if global_batch % pcount:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{pcount} processes")
    per = global_batch // pcount
    return pid * per, (pid + 1) * per


def shard_host_local_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Assemble global batch-sharded arrays from per-process local shards.

    ``batch`` is a pytree of host arrays holding THIS process's slice of
    the global batch (see ``host_batch_slice``). Under a single process
    this is identical to mesh.shard_batch.
    """
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, batch)
