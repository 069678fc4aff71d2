"""XLA nn.Conv-style depthwise forward vs the Pallas dwconv7 kernel at
training shapes (batch 128 = 64 two-view) and serving batch 256.

Decides whether the --fused_blocks training path should swap its XLA
dwconv forward for the Pallas kernel (keeping XLA dgrad/wgrad, which
measured fine — BENCH_NOTES.md round 3).
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

from count_pipnet_tpu.ops.pallas.dwconv import dwconv7  # noqa: E402

SHAPES = [
    ("stage1 56x56x96  b128", 128, 56, 96),
    ("stage2 28x28x192 b128", 128, 28, 192),
    ("stage3 27x27x384 b128", 128, 27, 384),
    ("stage4 26x26x768 b128", 128, 26, 768),
    ("stage1 56x56x96  b256", 256, 56, 96),
]


def timeit(fn, *args, iters=20):
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    jax.device_get(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.device_get(r)
    return (time.perf_counter() - t0) / iters


def dw_xla(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((3, 3), (3, 3)),
        feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def main():
    rng = np.random.default_rng(0)
    for label, bsz, hw, c in SHAPES:
        x = jnp.asarray(rng.normal(size=(bsz, hw, hw, c)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(7, 7, 1, c)) * 0.1, jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.bfloat16)
        t_x = timeit(dw_xla, x, k, b) * 1e3
        print(f"{label}: XLA {t_x:7.2f} ms", flush=True)
        try:
            t_p = timeit(lambda *a: dwconv7(*a), x, k, b) * 1e3
            y1 = jax.device_get(dw_xla(x, k, b)).astype(np.float32)
            y2 = jax.device_get(dwconv7(x, k, b)).astype(np.float32)
            err = np.max(np.abs(y1 - y2)) / (np.max(np.abs(y1)) + 1e-9)
            print(f"{'':25s} pallas {t_p:7.2f} ms   rel err {err:.2e}",
                  flush=True)
        except Exception as e:
            print(f"{'':25s} pallas FAILED: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
