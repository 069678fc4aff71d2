"""ds3 (stage3->4 downsample) variants (round-3).

After stride surgery ds3 is a 2x2 STRIDE-1 conv 384->768 at 27x27 -> 26x26
(reference features/convnext_features.py:5-15).  XLA's conv runs it at
62 TF/s bf16 (6.6 ms at batch 256).  Variants:

  conv     current jax.lax.conv_general_dilated (baseline)
  tap4     4 shifted slices @ [384,768] GEMMs, accumulated (no im2col
           materialization, each GEMM M=B*676 dense)
  tap4i8   same but int8 dynamic-quant GEMMs (known risk: breaks exact
           top-1; measured for the record)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

B, H, W, CIN, COUT = 256, 27, 27, 384, 768


def timeit(fn, *args, iters=20):
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    jax.device_get(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.device_get(r)
    return (time.perf_counter() - t0) / iters


def conv(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def tap4(x, k, b):
    ho, wo = H - 1, W - 1
    acc = None
    for dy in range(2):
        for dx in range(2):
            xs = x[:, dy:dy + ho, dx:dx + wo, :]
            t = jax.lax.dot_general(
                xs, k[dy, dx], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    return acc + b


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, CIN)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(2, 2, CIN, COUT)) * 0.05,
                    jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(COUT,)) * 0.01, jnp.bfloat16)
    flops = 2 * B * (H - 1) * (W - 1) * 4 * CIN * COUT

    a = np.asarray(conv(x, k, b), np.float32)
    c = np.asarray(tap4(x, k, b), np.float32)
    err = np.abs(a - c).max() / (np.abs(a).max() + 1e-9)
    print(f"tap4 rel err vs conv: {err:.3e}", flush=True)

    t = timeit(conv, x, k, b)
    print(f"conv  {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TF/s", flush=True)
    t = timeit(tap4, x, k, b)
    print(f"tap4  {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
