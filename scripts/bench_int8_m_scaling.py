"""Probe: does the int8 MXU GEMM rate at stage-3 K improve with M?

BENCH_NOTES round-3 measured the stage-3 whole-block kernel's int8 dots
at 151 TF/s (M=729 = one 27x27 image plane, K=384/1536) vs ~207 TF/s at
stage-4 shapes, and called the gap "shape-driven, not fixable at C=384".
That conclusion was reached at M=729 only.  The MLP part of a ConvNeXt
block has NO spatial structure — rows can be tiled across images
([B*HW, C] flat), so if the rate recovers at M-tiles of 1024/2048 the
right serving design for stage 3 is a split kernel: the existing
whole-block kernel up to LN+quant per image, then one flat-rows int8
MLP megakernel over the whole batch at a fat M tile.

The probe mirrors the real kernel's dataflow: each grid step loads an
int8 [tile, C] row block, runs dot(W1) -> shift-cast to int8 ->
dot(W2) -> int8 out, with both weights VMEM-resident across the grid —
the 4C intermediate never leaves VMEM, and the in/out HBM traffic per
step is tile*C*2 bytes (int8), so the measurement is MXU-rate-bound,
not bandwidth-bound.  A first version of this probe timed standalone
single GEMMs with bf16 outputs and measured 50 TF/s — pure HBM write
bandwidth, not the MXU; do not measure it that way.

Run on an IDLE TPU:  python scripts/bench_int8_m_scaling.py
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 384
HID = 4 * C


def _kern(x_ref, w1_ref, w2_ref, out_ref):
    hid = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.int32)
    hq = (hid >> 8).astype(jnp.int8)
    y = jnp.dot(hq, w2_ref[:], preferred_element_type=jnp.int32)
    out_ref[:] = (y >> 8).astype(jnp.int8)


def mlp_dots(xq, w1q, w2q, row_tile):
    m, c = xq.shape
    assert m % row_tile == 0
    rep = lambda i: (0, 0)
    return pl.pallas_call(
        _kern,
        grid=(m // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, HID), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((HID, c), rep, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(xq, w1q, w2q)


def _kern_3d(x_ref, w1_ref, w2_ref, out_ref):
    hid = jnp.dot(x_ref[0], w1_ref[:], preferred_element_type=jnp.int32)
    hq = (hid >> 8).astype(jnp.int8)
    y = jnp.dot(hq, w2_ref[:], preferred_element_type=jnp.int32)
    out_ref[0] = (y >> 8).astype(jnp.int8)


def mlp_dots_per_image(xq3, w1q, w2q):
    """Control: the current per-image layout ([B, HW, C], M=HW=729)."""
    b, hw, c = xq3.shape
    rep = lambda i: (0, 0)
    return pl.pallas_call(
        _kern_3d,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, HID), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((HID, c), rep, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(xq3, w1q, w2q)


def time_min(fn, *args, iters=20, reps=3):
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.int32)))
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    hw = 729
    rows_total = args.batch * hw  # 186624 at batch 256
    w1q = jnp.asarray(
        rng.integers(-127, 127, size=(C, HID), dtype=np.int8))
    w2q = jnp.asarray(
        rng.integers(-127, 127, size=(HID, C), dtype=np.int8))

    # control: current per-image layout, M=729
    xq3 = jnp.asarray(rng.integers(
        -127, 127, size=(args.batch, hw, C), dtype=np.int8))
    dt = time_min(mlp_dots_per_image, xq3, w1q, w2q)
    fl = 4 * args.batch * hw * C * HID
    print(f"{'tile':>6} {'ms':>8} {'TF/s':>7}")
    print(f"{'729/img':>6} {dt*1e3:8.2f} {fl/dt/1e12:7.1f}")

    for tile in (256, 512, 728, 1024, 1536, 2048):
        # VMEM: x tile*C + w 2*C*HID int8 + hid int32 tile*HID*4
        #       + hq tile*HID + y tile*C*4 + out tile*C
        vmem = (tile * C * 2 + 2 * C * HID + tile * HID * 5
                + tile * C * 5)
        m = (rows_total // tile) * tile
        if vmem > 15e6:
            print(f"{tile:>6}    (skip: est VMEM {vmem/1e6:.1f} MB)")
            continue
        xq = jnp.asarray(rng.integers(
            -127, 127, size=(m, C), dtype=np.int8))
        try:
            dt = time_min(functools.partial(mlp_dots, row_tile=tile),
                          xq, w1q, w2q)
        except Exception as e:  # VMEM/compile edge: report and move on
            print(f"{tile:>6}    FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")
            continue
        fl = 4 * m * C * HID
        print(f"{tile:>6} {dt*1e3:8.2f} {fl/dt/1e12:7.1f}")


if __name__ == "__main__":
    main()
