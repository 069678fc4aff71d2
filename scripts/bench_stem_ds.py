"""Stem + downsample levers for the whole-block serving path.

Round-3 marginals put stem+LN+pad at ~4.4 ms and ds1 at ~3.0 ms of the
92-94 ms batch-256 serving forward — both far above their traffic
floors (~1 ms and ~0.5 ms). Hypothesis: XLA's conv lowering is the
cost — the stem convolves with C_in=3 (lane-padded 3->128 on the MXU
operand relayout) and ds1 is a stride-2 2x2 conv whose im2col XLA
rebuilds implicitly. Both are exactly expressible as contiguous
reshapes + one GEMM (no transposes):

  stem:  x[B,224,224,3] -> [B,56,4,224*3]; slice dy -> [B,56,56,12]
         (the (dx,c) minor dims are already contiguous);
         4 GEMMs [B*3136,12]@[12,96] summed, or concat -> K=48 GEMM.
  ds1:   LN(h)[B,56,56,C] -> [B,28,2,56*C]; slice dy -> [B,28,28,2C]
         (adjacent w-pairs contiguous); concat dy0,dy1 -> [B,784,4C]
         @ kernel.reshape(4C, 2C).

Each variant is asserted against the XLA conv before timing.
Run on the real TPU: python scripts/bench_stem_ds.py
"""

import time

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from count_pipnet_tpu.models.quantized import _conv, _layer_norm


def timeit(fn, *args, iters=30):
    jax.device_get(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.device_get(r)
    return (time.perf_counter() - t0) / iters * 1e3


def stem_current(x, kernel, bias, lns, lnb):
    h = _conv(x, kernel, bias, 4, jnp.bfloat16)
    return _layer_norm(h, lns, lnb).astype(jnp.bfloat16)


def stem_gemm4(x, kernel, bias, lns, lnb):
    """4 dy-sliced K=12 GEMMs, accumulated."""
    b = x.shape[0]
    xr = x.reshape(b, 56, 4, 224 * 3)
    k = jnp.asarray(kernel, jnp.bfloat16)          # [4,4,3,96]
    acc = None
    for dy in range(4):
        sl = xr[:, :, dy].reshape(b * 56 * 56, 12).astype(jnp.bfloat16)
        g = jax.lax.dot_general(
            sl, k[dy].reshape(12, 96), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = g if acc is None else acc + g
    h = (acc + bias).reshape(b, 56, 56, 96)
    return _layer_norm(h, lns, lnb).astype(jnp.bfloat16)


def stem_gemm1(x, kernel, bias, lns, lnb):
    """Concat the 4 dy slices -> one K=48 GEMM."""
    b = x.shape[0]
    xr = x.reshape(b, 56, 4, 224 * 3)
    cols = jnp.concatenate(
        [xr[:, :, dy].reshape(b, 56, 56, 12) for dy in range(4)], axis=-1)
    k = jnp.asarray(kernel, jnp.bfloat16).reshape(48, 96)
    g = jax.lax.dot_general(
        cols.reshape(b * 56 * 56, 48).astype(jnp.bfloat16), k,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    h = (g + bias).reshape(b, 56, 56, 96)
    return _layer_norm(h, lns, lnb).astype(jnp.bfloat16)


def ds_current(h, lns, lnb, kernel, bias):
    hn = _layer_norm(h, lns, lnb).astype(jnp.bfloat16)
    return _conv(hn, kernel, bias, 2, jnp.bfloat16)


def ds_gemm(h, lns, lnb, kernel, bias):
    b, hh, ww, c = h.shape
    ho, wo = hh // 2, ww // 2
    hn = _layer_norm(h, lns, lnb).astype(jnp.bfloat16)
    xr = hn.reshape(b, ho, 2, ww * c)
    rows = [xr[:, :, dy].reshape(b, ho, wo, 2 * c) for dy in range(2)]
    cols = jnp.concatenate(rows, axis=-1)          # (dy, dx, c) order
    k = jnp.asarray(kernel, jnp.bfloat16).reshape(4 * c, kernel.shape[-1])
    g = jax.lax.dot_general(
        cols.reshape(b * ho * wo, 4 * c), k,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out = g + bias
    return out.reshape(b, ho, wo, kernel.shape[-1]).astype(jnp.bfloat16)


def main():
    batch = 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 224, 224, 3))
                    .astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(4, 4, 3, 96), scale=0.1)
                         .astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(96,)).astype(np.float32))
    lns = jnp.ones((96,), jnp.float32)
    lnb = jnp.zeros((96,), jnp.float32)

    cur = jax.jit(stem_current)
    g4 = jax.jit(stem_gemm4)
    g1 = jax.jit(stem_gemm1)
    ref = jax.device_get(cur(x, kernel, bias, lns, lnb)).astype(np.float32)
    for name, fn in [("gemm4", g4), ("gemm1", g1)]:
        got = jax.device_get(fn(x, kernel, bias, lns, lnb)) \
            .astype(np.float32)
        err = np.abs(got - ref).max()
        print(f"stem {name}: max abs err vs conv = {err:.5f}")
        assert err < 0.05, err
    print(f"stem current (conv+LN):   {timeit(cur, x, kernel, bias, lns, lnb):7.2f} ms")
    print(f"stem gemm4   (4x K=12):   {timeit(g4, x, kernel, bias, lns, lnb):7.2f} ms")
    print(f"stem gemm1   (K=48):      {timeit(g1, x, kernel, bias, lns, lnb):7.2f} ms")

    # ds1: 56x56x96 -> 28x28x192
    h = jnp.asarray(rng.normal(size=(batch, 56, 56, 96))
                    .astype(np.float32)).astype(jnp.bfloat16)
    k1 = jnp.asarray(rng.normal(size=(2, 2, 96, 192), scale=0.1)
                     .astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(192,)).astype(np.float32))
    l1s = jnp.ones((96,), jnp.float32)
    l1b = jnp.zeros((96,), jnp.float32)
    dcur = jax.jit(ds_current)
    dg = jax.jit(ds_gemm)
    ref = jax.device_get(dcur(h, l1s, l1b, k1, b1)).astype(np.float32)
    got = jax.device_get(dg(h, l1s, l1b, k1, b1)).astype(np.float32)
    err = np.abs(got - ref).max()
    print(f"ds1 gemm: max abs err vs conv = {err:.5f}")
    assert err < 0.1, err
    print(f"ds1 current (LN+conv s2): {timeit(dcur, h, l1s, l1b, k1, b1):7.2f} ms")
    print(f"ds1 gemm    (s2d GEMM):   {timeit(dg, h, l1s, l1b, k1, b1):7.2f} ms")

    # ds2: 28x28x192 -> 14x14x384
    h2 = jnp.asarray(rng.normal(size=(batch, 28, 28, 192))
                     .astype(np.float32)).astype(jnp.bfloat16)
    k2 = jnp.asarray(rng.normal(size=(2, 2, 192, 384), scale=0.1)
                     .astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=(384,)).astype(np.float32))
    l2s = jnp.ones((192,), jnp.float32)
    l2b = jnp.zeros((192,), jnp.float32)
    ref = jax.device_get(dcur(h2, l2s, l2b, k2, b2)).astype(np.float32)
    got = jax.device_get(dg(h2, l2s, l2b, k2, b2)).astype(np.float32)
    err = np.abs(got - ref).max()
    print(f"ds2 gemm: max abs err vs conv = {err:.5f}")
    assert err < 0.1, err
    print(f"ds2 current (LN+conv s2): {timeit(dcur, h2, l2s, l2b, k2, b2):7.2f} ms")
    print(f"ds2 gemm    (s2d GEMM):   {timeit(dg, h2, l2s, l2b, k2, b2):7.2f} ms")


if __name__ == "__main__":
    main()
