"""Worker for the multi-host DP test: one process of a 2-process x
4-virtual-CPU-device cluster (8 global devices).

Launched by tests/test_multihost.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set. Asserts the full multi-host
contract of count_pipnet_tpu.parallel.distributed: initialize, global
mesh, host-local feeding, global collective; prints one PSUM=<value>
line the test compares across processes and against the single-process
result.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "xla_force_host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    ["--xla_force_host_platform_device_count=4"] + _flags)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from count_pipnet_tpu.parallel import distributed as dist


def main():
    started = dist.maybe_initialize()
    assert started, "env vars should describe a multi-process run"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    mesh = dist.global_mesh()
    assert mesh.devices.size == 8

    # global batch 16 -> this host loads rows [pid*8, pid*8+8)
    global_batch = 16
    lo, hi = dist.host_batch_slice(global_batch)
    assert hi - lo == 8
    full = np.arange(global_batch * 3, dtype=np.float32) \
        .reshape(global_batch, 3)
    local = full[lo:hi]
    batch = dist.shard_host_local_batch(mesh, {"x": local})
    x = batch["x"]
    assert x.shape == (global_batch, 3)

    @jax.jit
    def global_stat(x):
        # data-dependent cross-host reduction: every device contributes
        return jnp.sum(x * x) + jnp.mean(x)

    val = float(jax.device_get(global_stat(x)))
    expect = float(np.sum(full * full) + np.mean(full))
    assert abs(val - expect) < 1e-3, (val, expect)
    print(f"PSUM={val:.4f}", flush=True)

    # Full sharded training step across the 2-process cluster: the same
    # entry the driver compiles single-process, now with the mesh spanning
    # both hosts (shard_batch feeds each host's slice, gradients
    # all-reduce across processes). Prints its own OK + loss line.
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


if __name__ == "__main__":
    main()
