"""Stage-3 decomposition bench (VERDICT round-2 item 1).

Stage 3 (C=384, 9 blocks, 27x27 planes) spends 38.0 of the serving
forward's 99.4 ms and its int8 GEMMs were measured at 105 TF/s vs 207 at
stage 4.  This script decomposes one stage-3 whole-block kernel on the
real TPU to find where the time goes, then times candidate fixes:

  base      current int8 whole-block kernel x9
  gemm-only int8 GEMMs alone (quant + 2 dots), per-image grid
  no-dw     kernel minus the dwconv (LN+quant+GEMM+GELU+residual)
  bf16-ew   GELU/elementwise in bf16 between the GEMMs
  chain3    3 consecutive blocks per pallas_call (weights VMEM-resident,
            plane never leaves VMEM between chained blocks)

Run: python scripts/bench_stage3_variants.py [--batch 256]
"""

import argparse
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

H = W = 27
HW = H * W
C = 384
HID = 4 * C
N_BLOCKS = 9


def timeit(fn, *args, iters=20):
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    jax.device_get(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.device_get(r)
    return (time.perf_counter() - t0) / iters


def block_args(rng, n=1):
    out = []
    for _ in range(n):
        out.append(dict(
            dwk=rng.normal(size=(7, 7, 1, C)).astype(np.float32) * 0.1,
            dwb=rng.normal(size=(C,)).astype(np.float32) * 0.01,
            lns=1 + rng.normal(size=(C,)).astype(np.float32) * 0.01,
            lnb=rng.normal(size=(C,)).astype(np.float32) * 0.01,
            w1=rng.normal(size=(C, HID)).astype(np.float32) * 0.05,
            b1=rng.normal(size=(HID,)).astype(np.float32) * 0.01,
            w2=rng.normal(size=(HID, C)).astype(np.float32) * 0.05,
            b2=rng.normal(size=(C,)).astype(np.float32) * 0.01,
            g=np.full((C,), 1e-2, np.float32),
        ))
    return out


# --------------------------------------------------------------- variants
def _kern_gemm_only(x_ref, w1_ref, s1_ref, w2_ref, s2_ref, out_ref):
    x = x_ref[0].astype(jnp.float32)
    nq, nsc = _quant_rows(x)
    hid = jnp.dot(nq, w1_ref[:], preferred_element_type=jnp.int32)
    hid = hid.astype(jnp.float32) * nsc * s1_ref[:]
    aq, asc = _quant_rows(hid)
    y = jnp.dot(aq, w2_ref[:], preferred_element_type=jnp.int32)
    out_ref[0] = (y.astype(jnp.float32) * asc * s2_ref[:]) \
        .astype(out_ref.dtype)


def gemm_only(x, w1q, s1, w2q, s2):
    b = x.shape[0]
    rep = lambda i: (0, 0)
    return pl.pallas_call(
        _kern_gemm_only,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, HW, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, HID), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HID), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((HID, C), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), rep, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, HW, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x, w1q, s1, w2q, s2)


def _kern_no_dw(x_ref, lns_ref, lnb_ref, w1_ref, s1_ref, b1_ref, w2_ref,
                s2_ref, b2_ref, g_ref, out_ref):
    x32 = x_ref[0].astype(jnp.float32)
    n = _layer_norm_rows(x32, lns_ref[:], lnb_ref[:], 1e-6)
    nq, nsc = _quant_rows(n)
    hid = jnp.dot(nq, w1_ref[:], preferred_element_type=jnp.int32)
    hid = hid.astype(jnp.float32) * nsc * s1_ref[:] + b1_ref[:]
    a = jax.nn.gelu(hid, approximate=True)
    aq, asc = _quant_rows(a)
    y = jnp.dot(aq, w2_ref[:], preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * asc * s2_ref[:] + b2_ref[:]
    out_ref[0] = (x32 + y * g_ref[:]).astype(out_ref.dtype)


def no_dw(x, p):
    w1q, s1 = quantize_block_weights(p["w1"])
    w2q, s2 = quantize_block_weights(p["w2"])
    vec = lambda v, n: jnp.asarray(v, jnp.float32).reshape(1, n)
    b = x.shape[0]
    rep = lambda i: (0, 0)
    return pl.pallas_call(
        _kern_no_dw,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, HW, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)] + [
            pl.BlockSpec(s, rep, memory_space=pltpu.VMEM)
            for s in [(1, C), (1, C), (C, HID), (1, HID), (1, HID),
                      (HID, C), (1, C), (1, C), (1, C)]],
        out_specs=pl.BlockSpec((1, HW, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x, vec(p["lns"], C), vec(p["lnb"], C), w1q, s1, vec(p["b1"], HID),
      w2q, s2, vec(p["b2"], C), vec(p["g"], C))


def _kern_bf16_ew(x_ref, dwk_ref, dwb_ref, lns_ref, lnb_ref, w1_ref,
                  s1_ref, b1_ref, w2_ref, s2_ref, b2_ref, g_ref, out_ref):
    x32 = x_ref[0].astype(jnp.float32)
    d = _dwconv_flat(x32, dwk_ref[:], dwb_ref[:], H, W)
    n = _layer_norm_rows(d, lns_ref[:], lnb_ref[:], 1e-6)
    nq, nsc = _quant_rows(n)
    hid = jnp.dot(nq, w1_ref[:], preferred_element_type=jnp.int32)
    # elementwise chain in bf16: scale/bias/GELU on the 4C-wide plane
    hidb = (hid.astype(jnp.float32) * nsc * s1_ref[:]
            + b1_ref[:]).astype(jnp.bfloat16)
    a = jax.nn.gelu(hidb, approximate=True)
    a32 = a.astype(jnp.float32)
    aq, asc = _quant_rows(a32)
    y = jnp.dot(aq, w2_ref[:], preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * asc * s2_ref[:] + b2_ref[:]
    out_ref[0] = (x32 + y * g_ref[:]).astype(out_ref.dtype)


def bf16_ew(x, p):
    w1q, s1 = quantize_block_weights(p["w1"])
    w2q, s2 = quantize_block_weights(p["w2"])
    vec = lambda v, n: jnp.asarray(v, jnp.float32).reshape(1, n)
    dwk = jnp.asarray(p["dwk"], jnp.float32).reshape(49, 1, C)
    b = x.shape[0]
    rep = lambda i: (0, 0)
    return pl.pallas_call(
        _kern_bf16_ew,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, HW, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((49, 1, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)] + [
            pl.BlockSpec(s, rep, memory_space=pltpu.VMEM)
            for s in [(1, C), (1, C), (1, C), (C, HID), (1, HID), (1, HID),
                      (HID, C), (1, C), (1, C), (1, C)]],
        out_specs=pl.BlockSpec((1, HW, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x, dwk, vec(p["dwb"], C), vec(p["lns"], C), vec(p["lnb"], C),
      w1q, s1, vec(p["b1"], HID), w2q, s2, vec(p["b2"], C), vec(p["g"], C))


def _kern_chain(x_ref, dwk_ref, dwb_ref, lns_ref, lnb_ref, w1_ref, s1_ref,
                b1_ref, w2_ref, s2_ref, b2_ref, g_ref, out_ref, *, n_chain):
    h = x_ref[0].astype(jnp.float32)
    for j in range(n_chain):
        d = _dwconv_flat(h, dwk_ref[j], dwb_ref[j:j + 1, 0], H, W)
        n = _layer_norm_rows(d, lns_ref[j:j + 1, 0], lnb_ref[j:j + 1, 0],
                             1e-6)
        nq, nsc = _quant_rows(n)
        hid = jnp.dot(nq, w1_ref[j], preferred_element_type=jnp.int32)
        hid = (hid.astype(jnp.float32) * nsc * s1_ref[j:j + 1, 0]
               + b1_ref[j:j + 1, 0])
        a = jax.nn.gelu(hid, approximate=True)
        aq, asc = _quant_rows(a)
        y = jnp.dot(aq, w2_ref[j], preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32) * asc * s2_ref[j:j + 1, 0]
             + b2_ref[j:j + 1, 0])
        h = h + y * g_ref[j:j + 1, 0]
    out_ref[0] = h.astype(out_ref.dtype)


def chain(x, ps):
    n_chain = len(ps)
    w1q = jnp.stack([quantize_block_weights(p["w1"])[0] for p in ps])
    s1 = jnp.stack([quantize_block_weights(p["w1"])[1] for p in ps])
    w2q = jnp.stack([quantize_block_weights(p["w2"])[0] for p in ps])
    s2 = jnp.stack([quantize_block_weights(p["w2"])[1] for p in ps])
    dwk = jnp.stack([jnp.asarray(p["dwk"], jnp.float32).reshape(49, C)
                     for p in ps])  # [n, 49, C]
    stackv = lambda k, n: jnp.stack(
        [jnp.asarray(p[k], jnp.float32).reshape(1, n) for p in ps])
    b = x.shape[0]
    rep3 = lambda i: (0, 0, 0)
    return pl.pallas_call(
        functools.partial(_kern_chain, n_chain=n_chain),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, HW, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chain, 49, C), rep3, memory_space=pltpu.VMEM)
        ] + [
            pl.BlockSpec((n_chain,) + s, rep3, memory_space=pltpu.VMEM)
            for s in [(1, C), (1, C), (1, C)]] + [
            pl.BlockSpec((n_chain, C, HID), rep3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chain, 1, HID), rep3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chain, 1, HID), rep3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chain, HID, C), rep3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chain, 1, C), rep3, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chain, 1, C), rep3, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chain, 1, C), rep3, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, HW, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x, dwk, stackv("dwb", C), stackv("lns", C), stackv("lnb", C),
      w1q, s1, stackv("b1", HID), w2q, s2, stackv("b2", C),
      stackv("g", C))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(args.batch, HW, C)), jnp.bfloat16)
    ps = block_args(rng, N_BLOCKS)
    gemm_flops = 4 * HW * C * HID * args.batch  # per block (2 GEMMs)

    def report(label, t, blocks=1):
        tf = gemm_flops * blocks / t / 1e12
        print(f"{label:28s} {t*1e3:8.2f} ms   {tf:6.1f} TF/s(GEMM) "
              f"  {t*1e3/blocks:6.2f} ms/block", flush=True)

    p = ps[0]

    # one full current block (int8)
    t = timeit(lambda xx: fused_block_apply(
        xx, H, W, p["dwk"], p["dwb"], p["lns"], p["lnb"], p["w1"],
        p["b1"], p["w2"], p["b2"], p["g"], int8=True), x,
        iters=args.iters)
    report("base int8 block x1", t)

    w1q, s1 = quantize_block_weights(p["w1"])
    w2q, s2 = quantize_block_weights(p["w2"])
    t = timeit(gemm_only, x, w1q, s1, w2q, s2, iters=args.iters)
    report("gemm-only (quant+2 dots)", t)

    t = timeit(lambda xx: no_dw(xx, p), x, iters=args.iters)
    report("no-dwconv", t)

    t = timeit(lambda xx: bf16_ew(xx, p), x, iters=args.iters)
    report("bf16 elementwise", t)

    for n_chain in (3, 9):
        try:
            t = timeit(lambda xx: chain(xx, ps[:n_chain]), x,
                       iters=args.iters)
            report(f"chain{n_chain}", t, blocks=n_chain)
        except Exception as e:
            print(f"chain{n_chain} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # full stage: 9x base for comparison
    def stage(xx):
        h = xx
        for p_ in ps:
            h = fused_block_apply(
                h, H, W, p_["dwk"], p_["dwb"], p_["lns"], p_["lnb"],
                p_["w1"], p_["b1"], p_["w2"], p_["b2"], p_["g"], int8=True)
        return h
    t = timeit(stage, x, iters=args.iters)
    report("full stage base (9x)", t, blocks=9)


if __name__ == "__main__" and "--extra" not in __import__("sys").argv:
    main()


# ---- round-3 follow-ups (run with --extra) --------------------------------
def _kern_pure_dot(xq_ref, w1_ref, w2_ref, out_ref):
    hid = jnp.dot(xq_ref[0], w1_ref[:], preferred_element_type=jnp.int32)
    hq = (hid >> 8).astype(jnp.int8)
    y = jnp.dot(hq, w2_ref[:], preferred_element_type=jnp.int32)
    out_ref[0] = y


def pure_dot(xq, w1q, w2q):
    b = xq.shape[0]
    rep = lambda i: (0, 0)
    return pl.pallas_call(
        _kern_pure_dot,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, HW, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, HID), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((HID, C), rep, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, HW, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xq.shape, jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(xq, w1q, w2q)


def chain_par(x, ps):
    """chain with parallel grid semantics (images independent)."""
    import count_pipnet_tpu  # noqa: F401
    n_chain = len(ps)
    w1q = jnp.stack([quantize_block_weights(p["w1"])[0] for p in ps])
    s1 = jnp.stack([quantize_block_weights(p["w1"])[1] for p in ps])
    w2q = jnp.stack([quantize_block_weights(p["w2"])[0] for p in ps])
    s2 = jnp.stack([quantize_block_weights(p["w2"])[1] for p in ps])
    dwk = jnp.stack([jnp.asarray(p["dwk"], jnp.float32).reshape(49, C)
                     for p in ps])
    stackv = lambda k, n: jnp.stack(
        [jnp.asarray(p[k], jnp.float32).reshape(1, n) for p in ps])
    b = x.shape[0]
    rep3 = lambda i: (0, 0, 0)
    return pl.pallas_call(
        functools.partial(_kern_chain, n_chain=n_chain),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, HW, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chain, 49, C), rep3, memory_space=pltpu.VMEM)
        ] + [
            pl.BlockSpec((n_chain,) + s, rep3, memory_space=pltpu.VMEM)
            for s in [(1, C), (1, C), (1, C)]] + [
            pl.BlockSpec((n_chain, C, HID), rep3, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chain, 1, HID), rep3, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chain, 1, HID), rep3, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chain, HID, C), rep3, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chain, 1, C), rep3, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chain, 1, C), rep3, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chain, 1, C), rep3, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, HW, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x, dwk, stackv("dwb", C), stackv("lns", C), stackv("lnb", C),
      w1q, s1, stackv("b1", HID), w2q, s2, stackv("b2", C), stackv("g", C))


def extra():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--extra", action="store_true")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(args.batch, HW, C)), jnp.bfloat16)
    xq = jnp.asarray(rng.integers(-127, 127, size=(args.batch, HW, C)),
                     jnp.int8)
    ps = block_args(rng, N_BLOCKS)
    gemm_flops = 4 * HW * C * HID * args.batch

    def report(label, t, blocks=1):
        tf = gemm_flops * blocks / t / 1e12
        print(f"{label:28s} {t*1e3:8.2f} ms   {tf:6.1f} TF/s(GEMM) "
              f"  {t*1e3/blocks:6.2f} ms/block", flush=True)

    p = ps[0]
    w1q, _ = quantize_block_weights(p["w1"])
    w2q, _ = quantize_block_weights(p["w2"])
    t = timeit(pure_dot, xq, w1q, w2q, iters=args.iters)
    report("pure int8 dots (no quant)", t)

    for n_chain in (3, 9):
        try:
            t = timeit(lambda xx: chain_par(xx, ps[:n_chain]), x,
                       iters=args.iters)
            report(f"chain{n_chain} parallel", t, blocks=n_chain)
        except Exception as e:
            print(f"chain{n_chain} par FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    # bt=2 row-concat retry (round-2 compile-helper crash at grid 128)
    try:
        t = timeit(lambda xx: fused_block_apply(
            xx, H, W, p["dwk"], p["dwb"], p["lns"], p["lnb"], p["w1"],
            p["b1"], p["w2"], p["b2"], p["g"], int8=True, batch_tile=2),
            x, iters=args.iters)
        report("base int8 bt=2", t)
    except Exception as e:
        print(f"bt=2 FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)


if __name__ == "__main__" and "--extra" in __import__("sys").argv:
    extra()
    raise SystemExit
