"""Where does the training backward go? dwconv dgrad/wgrad timings.

XLA depthwise-conv weight gradients are often lowered poorly; this times
forward, full vjp, and the two gradient components separately at the
training shapes (batch 128 = 64 two-view).
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

SHAPES = [
    ("stage1 56x56x96 ", 128, 56, 96),
    ("stage2 28x28x192", 128, 28, 192),
    ("stage3 27x27x384", 128, 27, 384),
    ("stage4 26x26x768", 128, 26, 768),
]


def timeit(fn, *args, iters=10):
    f = jax.jit(lambda *a: jax.tree_util.tree_map(
        lambda t: jnp.sum(t.astype(jnp.float32)), fn(*a)))
    jax.device_get(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.device_get(r)
    return (time.perf_counter() - t0) / iters


def dw(x, k):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((3, 3), (3, 3)),
        feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    rng = np.random.default_rng(0)
    for label, b, hw, c in SHAPES:
        x = jnp.asarray(rng.normal(size=(b, hw, hw, c)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(7, 7, 1, c)) * 0.1, jnp.bfloat16)
        g = jnp.asarray(rng.normal(size=(b, hw, hw, c)), jnp.bfloat16)

        t_f = timeit(dw, x, k)
        t_dx = timeit(lambda xx: jax.vjp(lambda v: dw(v, k), xx)[1](g), x)
        t_dk = timeit(lambda kk: jax.vjp(lambda v: dw(x, v), kk)[1](g), k)

        from count_pipnet_tpu.ops.pallas.dwconv_bwd import dwconv7_wgrad
        t_pk = timeit(lambda xx, gg: dwconv7_wgrad(xx, gg), x, g)
        # numerical check against the XLA wgrad
        dk_ref = jax.vjp(lambda v: dw(x, v), k)[1](g)[0]
        dk_p, _ = dwconv7_wgrad(x, g)
        err = float(jnp.max(jnp.abs(
            dk_p - dk_ref.astype(jnp.float32))) /
            (float(jnp.max(jnp.abs(dk_ref))) + 1e-9))
        print(f"{label}: fwd {t_f*1e3:6.2f}  dgrad {t_dx*1e3:6.2f}  "
              f"wgrad {t_dk*1e3:6.2f}  pallas-wgrad {t_pk*1e3:6.2f} ms  "
              f"(rel err {err:.2e})", flush=True)


if __name__ == "__main__":
    main()
