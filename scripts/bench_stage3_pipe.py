"""Stage-3 VPU/MXU overlap experiments (round-3).

The whole-block kernel serializes dwconv+LN+quant (VPU) with the int8
GEMMs (MXU): per-block 4.25 ms vs max(VPU ~3.3, MXU ~2.9) under perfect
overlap.  Variants:

  pair      2 images per grid step, program order dw(0),dw(1),
            gemms(0),gemms(1) — independent chains adjacent, NO row
            concat (the concat variant crashes the remote compile
            helper); scheduler free to interleave VPU(1) with MXU(0).
  pipe      software pipeline via scratch: step i runs VPU(i) and
            MXU(i-1) on data stashed by the previous step.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from count_pipnet_tpu.ops.pallas.fused_block import (  # noqa: E402
    _dwconv_flat, _layer_norm_rows, _quant_rows, quantize_block_weights,
    fused_block_apply,
)
from scripts.bench_stage3_variants import block_args  # noqa: E402

H = W = 27
HW = H * W
C = 384
HID = 4 * C


def timeit(fn, *args, iters=20):
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    jax.device_get(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.device_get(r)
    return (time.perf_counter() - t0) / iters


def _mk_args(p):
    w1q, s1 = quantize_block_weights(p["w1"])
    w2q, s2 = quantize_block_weights(p["w2"])
    vec = lambda v, n: jnp.asarray(v, jnp.float32).reshape(1, n)
    dwk = jnp.asarray(p["dwk"], jnp.float32).reshape(49, 1, C)
    return (dwk, vec(p["dwb"], C), vec(p["lns"], C), vec(p["lnb"], C),
            w1q, s1, vec(p["b1"], HID), w2q, s2, vec(p["b2"], C),
            vec(p["g"], C))


def _kern_pair(x_ref, dwk_ref, dwb_ref, lns_ref, lnb_ref, w1_ref, s1_ref,
               b1_ref, w2_ref, s2_ref, b2_ref, g_ref, out_ref):
    xs = [x_ref[i].astype(jnp.float32) for i in range(2)]
    # VPU phase for both images first...
    quanted = []
    for x32 in xs:
        d = _dwconv_flat(x32, dwk_ref[:], dwb_ref[:], H, W)
        n = _layer_norm_rows(d, lns_ref[:], lnb_ref[:], 1e-6)
        quanted.append(_quant_rows(n))
    # ...then both MXU chains (independent of each other)
    for i, (nq, nsc) in enumerate(quanted):
        hid = jnp.dot(nq, w1_ref[:], preferred_element_type=jnp.int32)
        hid = hid.astype(jnp.float32) * nsc * s1_ref[:] + b1_ref[:]
        a = jax.nn.gelu(hid, approximate=True)
        aq, asc = _quant_rows(a)
        y = jnp.dot(aq, w2_ref[:], preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * asc * s2_ref[:] + b2_ref[:]
        out_ref[i] = (xs[i] + y * g_ref[:]).astype(out_ref.dtype)


def pair(x, p):
    b = x.shape[0]
    rep = lambda i: (0, 0)
    return pl.pallas_call(
        _kern_pair,
        grid=(b // 2,),
        in_specs=[
            pl.BlockSpec((2, HW, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((49, 1, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)] + [
            pl.BlockSpec(s, rep, memory_space=pltpu.VMEM)
            for s in [(1, C), (1, C), (1, C), (C, HID), (1, HID),
                      (1, HID), (HID, C), (1, C), (1, C), (1, C)]],
        out_specs=pl.BlockSpec((2, HW, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x, *_mk_args(p))


def _kern_pipe(x_ref, dwk_ref, dwb_ref, lns_ref, lnb_ref, w1_ref, s1_ref,
               b1_ref, w2_ref, s2_ref, b2_ref, g_ref, out_ref,
               nq_s, nsc_s, res_s):
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    # MXU phase: GEMMs for image i-1 from stashed quantized activations
    @pl.when(i > 0)
    def _():
        nq = nq_s[:]
        nsc = nsc_s[:]
        hid = jnp.dot(nq, w1_ref[:], preferred_element_type=jnp.int32)
        hid = hid.astype(jnp.float32) * nsc * s1_ref[:] + b1_ref[:]
        a = jax.nn.gelu(hid, approximate=True)
        aq, asc = _quant_rows(a)
        y = jnp.dot(aq, w2_ref[:], preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * asc * s2_ref[:] + b2_ref[:]
        out_ref[0] = (res_s[:] + y * g_ref[:]).astype(out_ref.dtype)

    # VPU phase: dwconv+LN+quant for image i, stashed for the next step
    @pl.when(i < nb - 1)
    def _():
        x32 = x_ref[0].astype(jnp.float32)
        d = _dwconv_flat(x32, dwk_ref[:], dwb_ref[:], H, W)
        n = _layer_norm_rows(d, lns_ref[:], lnb_ref[:], 1e-6)
        nq, nsc = _quant_rows(n)
        nq_s[:] = nq
        nsc_s[:] = nsc
        res_s[:] = x32


def pipe(x, p):
    b = x.shape[0]
    rep = lambda i: (0, 0)
    return pl.pallas_call(
        _kern_pipe,
        grid=(b + 1,),
        in_specs=[
            pl.BlockSpec((1, HW, C), lambda i: (jnp.minimum(i, b - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((49, 1, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)] + [
            pl.BlockSpec(s, rep, memory_space=pltpu.VMEM)
            for s in [(1, C), (1, C), (1, C), (C, HID), (1, HID),
                      (1, HID), (HID, C), (1, C), (1, C), (1, C)]],
        out_specs=pl.BlockSpec((1, HW, C), lambda i: (jnp.maximum(i - 1, 0), 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((HW, C), jnp.int8),
            pltpu.VMEM((HW, 1), jnp.float32),
            pltpu.VMEM((HW, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x, *_mk_args(p))


def main():
    batch, iters = 256, 20
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, HW, C)), jnp.bfloat16)
    ps = block_args(rng, 9)
    p = ps[0]
    gemm_flops = 4 * HW * C * HID * batch

    ref = np.asarray(fused_block_apply(
        x, H, W, p["dwk"], p["dwb"], p["lns"], p["lnb"], p["w1"], p["b1"],
        p["w2"], p["b2"], p["g"], int8=True), np.float32)

    def report(label, t, blocks=1):
        print(f"{label:16s} {t*1e3:8.2f} ms  "
              f"{gemm_flops*blocks/t/1e12:6.1f} TF/s  "
              f"{t*1e3/blocks:6.2f} ms/block", flush=True)

    for label, fn in [("pipe", pipe)]:
        try:
            got = np.asarray(fn(x, p), np.float32)
            err = np.abs(got - ref).max()
            print(f"{label} max|err| vs base: {err:.3e}", flush=True)
            t = timeit(fn, x, p, iters=iters)
            report(label, t)
            # 9-block stage
            def stage(xx, fn=fn):
                h = xx
                for p_ in ps:
                    h = fn(h, p_)
                return h
            t = timeit(stage, x, iters=iters)
            report(f"stage-{label}(9)", t, blocks=9)
        except Exception as e:
            print(f"{label} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
