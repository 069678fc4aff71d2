"""Microbenchmark: Pallas int8 vs bf16 GEMM at ConvNeXt block-MLP shapes.

Decides the int8 serving strategy (VERDICT.md round-2 item 1): does an
int8 x int8 -> int32 matmul inside a Pallas kernel run ~2x the bf16 MXU
rate on this chip?  Run on the real TPU:

    python scripts/bench_int8_gemm.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gemm_kernel(x_ref, w_ref, out_ref, *, out_dtype):
    out_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                         preferred_element_type=out_dtype)


def pallas_gemm(x, w, row_tile=512, out_dtype=jnp.float32):
    m, k = x.shape
    _, n = w.shape
    grid = (m // row_tile,)
    return pl.pallas_call(
        functools.partial(_gemm_kernel, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
    )(x, w)


def _quant_gemm_kernel(x_ref, wq_ref, ws_ref, out_ref):
    """bf16 activations -> per-row dynamic int8 quant -> int8 GEMM ->
    dequant, all in VMEM."""
    x = x_ref[:].astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    ascale = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.round(x / ascale).astype(jnp.int8)
    acc = jnp.dot(xq, wq_ref[:], preferred_element_type=jnp.int32)
    out_ref[:] = acc.astype(jnp.float32) * ascale * ws_ref[:]


def pallas_quant_gemm(x, wq, wscale, row_tile=512):
    m, k = x.shape
    _, n = wq.shape
    return pl.pallas_call(
        _quant_gemm_kernel,
        grid=(m // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
    )(x, wq, wscale)


def timeit(fn, *args, iters=20):
    # sum inside jit: forces the GEMM but ships one scalar over the tunnel
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    jax.device_get(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.device_get(r)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    # (label, M, K, N) — stage3/4 pw1+pw2 shapes at batch 256
    shapes = [
        # batch-64-equivalent row counts (quarter of batch 256): timing
        # per-GEMM rate, not end-to-end
        ("stage3 pw1  M=46k K=384  N=1536", 46592, 384, 1536),
        ("stage3 pw2  M=46k K=1536 N=384", 46592, 1536, 384),
        ("stage4 pw1  M=43k K=768  N=3072", 43136, 768, 3072),
        ("stage4 pw2  M=43k K=3072 N=768", 43136, 3072, 768),
    ]
    for label, m, k, n in shapes:
        flops = 2 * m * k * n
        x32 = rng.normal(size=(m, k)).astype(np.float32)
        w32 = rng.normal(size=(k, n)).astype(np.float32)
        xb = jnp.asarray(x32, jnp.bfloat16)
        wb = jnp.asarray(w32, jnp.bfloat16)
        xq = jnp.asarray(np.clip(np.round(x32 * 10), -127, 127), jnp.int8)
        wq = jnp.asarray(np.clip(np.round(w32 * 10), -127, 127), jnp.int8)
        ws = jnp.ones((1, n), jnp.float32)

        t_bf16 = timeit(pallas_gemm, xb, wb)
        t_int8 = timeit(functools.partial(pallas_gemm,
                                          out_dtype=jnp.int32), xq, wq)
        t_qdyn = timeit(pallas_quant_gemm, xb, wq, ws)
        print(f"{label}:")
        print(f"  bf16xbf16->f32 : {t_bf16*1e3:7.2f} ms  "
              f"{flops/t_bf16/1e12:6.1f} TF/s")
        print(f"  int8xint8->i32 : {t_int8*1e3:7.2f} ms  "
              f"{flops/t_int8/1e12:6.1f} TF/s  "
              f"({t_bf16/t_int8:.2f}x vs bf16)")
        print(f"  dynq(bf16->i8) : {t_qdyn*1e3:7.2f} ms  "
              f"{flops/t_qdyn/1e12:6.1f} TF/s  "
              f"({t_bf16/t_qdyn:.2f}x vs bf16)", flush=True)


if __name__ == "__main__":
    main()
