"""Microbench: fused Pallas MLP backward vs XLA remat vjp (stage3 shape).

rows = 128 images x 729 positions (training batch 64 two-view), C=384.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))

from count_pipnet_tpu.ops.pallas.fused_mlp import _mlp_body  # noqa: E402
from count_pipnet_tpu.ops.pallas.fused_mlp_bwd import (  # noqa: E402
    fused_mlp_bwd,
)

ROWS, C = 128 * 729, 384
HID = 4 * C


def timeit(fn, *args, iters=15):
    f = jax.jit(lambda *a: jax.tree_util.tree_map(
        lambda t: jnp.sum(t.astype(jnp.float32)), fn(*a)))
    jax.device_get(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.device_get(r)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(ROWS, C)), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(ROWS, C)), jnp.bfloat16)
    ls = jnp.ones((C,), jnp.float32)
    lb = jnp.zeros((C,), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(C, HID)) * 0.05, jnp.float32)
    b1 = jnp.zeros((HID,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(HID, C)) * 0.05, jnp.float32)
    b2 = jnp.zeros((C,), jnp.float32)
    gm = jnp.full((C,), 1e-2, jnp.float32)

    def xla_bwd(x, g, ls, lb, w1, b1, w2, b2, gm):
        _, vjp_fn = jax.vjp(
            lambda *a: _mlp_body(*a, 1e-6), x, ls, lb, w1, b1, w2, b2, gm)
        return vjp_fn(g.astype(jnp.float32))

    t = timeit(xla_bwd, x, g, ls, lb, w1, b1, w2, b2, gm)
    print(f"xla remat vjp : {t*1e3:7.2f} ms", flush=True)

    t = timeit(lambda *a: fused_mlp_bwd(*a), x, g, ls, lb, w1, b1, w2,
               b2, gm)
    print(f"pallas bwd    : {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
