"""Probe: does the int8 MXU GEMM rate at stage-3 K improve with M?

BENCH_NOTES round-3 measured the stage-3 whole-block kernel's int8 dots
at 151 TF/s (M=729 = one 27x27 image plane, K=384/1536) vs ~207 TF/s at
stage-4 shapes, and called the gap "shape-driven, not fixable at C=384".
That conclusion was reached at M=729 only.  The MLP part of a ConvNeXt
block has NO spatial structure — rows can be tiled across images
([B*HW, C] flat), so if the rate recovers at M-tiles of 1024/2048 the
right serving design for stage 3 is a split kernel: XLA (or padded-
plane Pallas) dwconv per image, then one flat-rows int8 MLP megakernel
over the whole batch at a fat M tile.

Times a pre-quantized int8 x int8 -> int32 pallas GEMM (pure MXU rate,
no quant overhead) at stage-3 K/N for row tiles {256,512,729,1024,2048}
and both GEMM orientations (C->4C and 4C->C).  Run on an IDLE TPU:

    python scripts/bench_int8_m_scaling.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kern(x_ref, w_ref, out_ref):
    out_ref[:] = jnp.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.int32
    ).astype(out_ref.dtype)


def int8_gemm(x, w, row_tile, out_dtype=jnp.bfloat16):
    m, k = x.shape
    _, n = w.shape
    assert m % row_tile == 0
    return pl.pallas_call(
        _kern,
        grid=(m // row_tile,),
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


def int8_gemm_mn(x, w, row_tile, col_tile, out_dtype=jnp.bfloat16):
    """2-D (M,N) grid so fat M tiles fit VMEM with half-width N panels."""
    m, k = x.shape
    _, n = w.shape
    assert m % row_tile == 0 and n % col_tile == 0
    return pl.pallas_call(
        _kern,
        grid=(m // row_tile, n // col_tile),
        in_specs=[
            pl.BlockSpec((row_tile, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, col_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, col_tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
    )(x, w)


def time_min(fn, *args, iters=10, reps=3):
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    jax.device_get(f(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(*args)
        jax.device_get(r)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    rng = np.random.default_rng(0)
    batch, hw = 256, 729
    rows_total = batch * hw  # 186624
    # s3 up/down, s4 up (rate anchor), s2 up (int8-for-stage2 question)
    shapes = [(384, 1536), (1536, 384), (768, 3072), (192, 768)]
    print(f"{'K':>5} {'N':>5} {'tile':>5} {'ms':>8} {'TF/s':>7}")
    for k, n in shapes:
        w = rng.integers(-127, 127, size=(k, n), dtype=np.int8)
        for tile in (256, 512, 729, 1024, 2048, 4096):
            m = (rows_total // tile) * tile
            # VMEM: tile*k + k*n int8 + tile*n bf16 out (+acc)
            vmem = tile * k + k * n + tile * n * 2 + tile * n * 4
            if vmem > 14e6:
                print(f"{k:>5} {n:>5} {tile:>5}    (skip: VMEM {vmem/1e6:.1f} MB)")
                continue
            x = rng.integers(-127, 127, size=(m, k), dtype=np.int8)
            dt = time_min(functools.partial(int8_gemm, row_tile=tile),
                          jnp.asarray(x), jnp.asarray(w))
            tf = 2 * m * k * n / dt / 1e12
            print(f"{k:>5} {n:>5} {tile:>5} {dt*1e3:8.2f} {tf:7.1f}")
        # fat-M with half-N panels (2-D grid) — only matters for wide N
        for tile, ctile in ((2048, n // 2), (4096, n // 4)):
            m = (rows_total // tile) * tile
            vmem = tile * k + k * ctile + tile * ctile * 6
            if vmem > 14e6 or ctile % 128:
                continue
            x = rng.integers(-127, 127, size=(m, k), dtype=np.int8)
            dt = time_min(
                functools.partial(int8_gemm_mn, row_tile=tile,
                                  col_tile=ctile),
                jnp.asarray(x), jnp.asarray(w))
            tf = 2 * m * k * n / dt / 1e12
            print(f"{k:>5} {n:>5} {tile:>5}x{ctile:<5} {dt*1e3:6.2f} {tf:7.1f}")


if __name__ == "__main__":
    main()
