from .mesh import (
    make_mesh, batch_sharding, replicated_sharding, shard_batch,
    replicate, local_device_count,
)

__all__ = [
    "make_mesh", "batch_sharding", "replicated_sharding", "shard_batch",
    "replicate", "local_device_count",
]
