"""Padded-plane dwconv prototype (round-3 stage3 attack).

Layout: each image plane stored zero-padded as [3*WP + H*WP + 3*WP, C]
with WP = 32 (W padded 27->32).  Vertical taps become aligned static
slices into the pre-padded buffer (no rolls, no masks); horizontal taps
become 7 unmasked pltpu.rolls (zeros flow in from the pad columns).
One pad-column mask at write-out maintains the invariant.

Measures, at stage-3 geometry (27x27x384, batch 256):
  dw-cur    dwconv-only kernel, current roll+mask implementation
  dw-pad    dwconv-only kernel, padded layout
  blk-cur   whole int8 block (reference point, = bench_stage3_variants)
  blk-pad   whole int8 block on the padded layout (GEMMs at M=864)
  dotM864   pure int8 dots at M=864 (alignment/rate probe)
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

import argparse
_ap = argparse.ArgumentParser()
_ap.add_argument("--geom", default="s3", choices=["s1", "s2", "s3", "s4"])
_ap.add_argument("--batch", type=int, default=256)
_GEOMS = {"s1": (56, 56, 64, 96), "s2": (28, 28, 32, 192),
          "s3": (27, 27, 32, 384), "s4": (26, 26, 32, 768)}
_a, _ = _ap.parse_known_args()
H, W, WP, C = _GEOMS[_a.geom]
HWP = H * WP
PADR = 3 * WP
TOT = HWP + 2 * PADR
HID = 4 * C
BATCH = _a.batch


def timeit(fn, *args, iters=20):
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    jax.device_get(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.device_get(r)
    return (time.perf_counter() - t0) / iters


def pad_planes(x4):
    """[B, H, W, C] -> [B, TOT, C] zero-padded flattened planes."""
    b = x4.shape[0]
    xp = jnp.pad(x4, ((0, 0), (3, 3), (0, WP - W), (0, 0)))
    return xp.reshape(b, TOT, C)


def unpad_planes(xp):
    b = xp.shape[0]
    x = xp[:, PADR:PADR + HWP].reshape(b, H, WP, -1)
    return x[:, :, :W]


def _dwconv_pad(xp32, wk, bias, colmask):
    """Depthwise 7x7 on a padded [TOT, C] plane; returns [HWP, C] f32
    (pad cols contain garbage until masked)."""
    acc = jnp.broadcast_to(bias.astype(jnp.float32), (HWP, C))
    # 7 vertical taps: aligned static slices of the zero-padded buffer
    xds = [xp32[dy * WP:dy * WP + HWP] for dy in range(7)]
    for dx in range(7):
        vs = None
        for dy in range(7):
            t = xds[dy] * wk[dy * 7 + dx]
            vs = t if vs is None else vs + t
        sd = dx - 3
        if sd:
            # unmasked roll: zeros flow in from the pad columns
            vs = pltpu.roll(vs, (-sd) % HWP, axis=0)
        acc = acc + vs
    return acc * colmask


def _kern_dw_cur(x_ref, dwk_ref, dwb_ref, out_ref):
    x32 = x_ref[0].astype(jnp.float32)
    out_ref[0] = _dwconv_flat(x32, dwk_ref[:], dwb_ref[:], H, W) \
        .astype(out_ref.dtype)


def dw_cur(x, dwk, dwb):
    b = x.shape[0]
    hw = H * W
    return pl.pallas_call(
        _kern_dw_cur,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((49, 1, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x, dwk, dwb)


def _kern_dw_pad(x_ref, dwk_ref, dwb_ref, cm_ref, out_ref):
    xp32 = x_ref[0].astype(jnp.float32)
    d = _dwconv_pad(xp32, dwk_ref[0], dwb_ref[:], cm_ref[:])
    out_ref[0, PADR:PADR + HWP] = d.astype(out_ref.dtype)
    out_ref[0, :PADR] = jnp.zeros((PADR, C), out_ref.dtype)
    out_ref[0, PADR + HWP:] = jnp.zeros((PADR, C), out_ref.dtype)


def dw_pad(xp, dwk, dwb, cm):
    b = xp.shape[0]
    return pl.pallas_call(
        _kern_dw_pad,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, TOT, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 49, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HWP, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TOT, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(xp, dwk, dwb, cm)


def _kern_blk_pad(x_ref, dwk_ref, dwb_ref, lns_ref, lnb_ref, w1_ref,
                  s1_ref, b1_ref, w2_ref, s2_ref, b2_ref, g_ref, cm_ref,
                  out_ref):
    xp32 = x_ref[0].astype(jnp.float32)
    d = _dwconv_pad(xp32, dwk_ref[0], dwb_ref[:], cm_ref[:])
    n = _layer_norm_rows(d, lns_ref[:], lnb_ref[:], 1e-6)
    nq, nsc = _quant_rows(n)
    hid = jnp.dot(nq, w1_ref[:], preferred_element_type=jnp.int32)
    hid = hid.astype(jnp.float32) * nsc * s1_ref[:] + b1_ref[:]
    a = jax.nn.gelu(hid, approximate=True)
    aq, asc = _quant_rows(a)
    y = jnp.dot(aq, w2_ref[:], preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * asc * s2_ref[:] + b2_ref[:]
    res = (xp32[PADR:PADR + HWP] + y * g_ref[:]) * cm_ref[:]
    out_ref[0, PADR:PADR + HWP] = res.astype(out_ref.dtype)
    out_ref[0, :PADR] = jnp.zeros((PADR, C), out_ref.dtype)
    out_ref[0, PADR + HWP:] = jnp.zeros((PADR, C), out_ref.dtype)


def blk_pad(xp, p, cm):
    w1q, s1 = quantize_block_weights(p["w1"])
    w2q, s2 = quantize_block_weights(p["w2"])
    vec = lambda v, n: jnp.asarray(v, jnp.float32).reshape(1, n)
    dwk = jnp.asarray(p["dwk"], jnp.float32).reshape(1, 49, C)
    b = xp.shape[0]
    rep = lambda i: (0, 0)
    return pl.pallas_call(
        _kern_blk_pad,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, TOT, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 49, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)] + [
            pl.BlockSpec(s, rep, memory_space=pltpu.VMEM)
            for s in [(1, C), (1, C), (1, C), (C, HID), (1, HID), (1, HID),
                      (HID, C), (1, C), (1, C), (1, C)]] + [
            pl.BlockSpec((HWP, 1), rep, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TOT, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(xp, dwk, vec(p["dwb"], C), vec(p["lns"], C), vec(p["lnb"], C),
      w1q, s1, vec(p["b1"], HID), w2q, s2, vec(p["b2"], C),
      vec(p["g"], C), cm)


def _kern_blk_pad_bf16(x_ref, dwk_ref, dwb_ref, lns_ref, lnb_ref, w1_ref,
                       b1_ref, w2_ref, b2_ref, g_ref, cm_ref, out_ref):
    xp32 = x_ref[0].astype(jnp.float32)
    d = _dwconv_pad(xp32, dwk_ref[0], dwb_ref[:], cm_ref[:])
    n = _layer_norm_rows(d, lns_ref[:], lnb_ref[:], 1e-6)
    hid = jnp.dot(n.astype(jnp.bfloat16), w1_ref[:],
                  preferred_element_type=jnp.float32) + b1_ref[:]
    a = jax.nn.gelu(hid, approximate=True)
    y = jnp.dot(a.astype(jnp.bfloat16), w2_ref[:],
                preferred_element_type=jnp.float32) + b2_ref[:]
    res = (xp32[PADR:PADR + HWP] + y * g_ref[:]) * cm_ref[:]
    out_ref[0, PADR:PADR + HWP] = res.astype(out_ref.dtype)
    out_ref[0, :PADR] = jnp.zeros((PADR, C), out_ref.dtype)
    out_ref[0, PADR + HWP:] = jnp.zeros((PADR, C), out_ref.dtype)


def blk_pad_bf16(xp, p, cm):
    vec = lambda v, n: jnp.asarray(v, jnp.float32).reshape(1, n)
    dwk = jnp.asarray(p["dwk"], jnp.float32).reshape(1, 49, C)
    b = xp.shape[0]
    rep = lambda i: (0, 0)
    return pl.pallas_call(
        _kern_blk_pad_bf16,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, TOT, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 49, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)] + [
            pl.BlockSpec(s, rep, memory_space=pltpu.VMEM)
            for s in [(1, C), (1, C), (1, C), (C, HID), (1, HID),
                      (HID, C), (1, C), (1, C)]] + [
            pl.BlockSpec((HWP, 1), rep, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TOT, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(xp, dwk, vec(p["dwb"], C), vec(p["lns"], C), vec(p["lnb"], C),
      jnp.asarray(p["w1"], jnp.bfloat16), vec(p["b1"], HID),
      jnp.asarray(p["w2"], jnp.bfloat16), vec(p["b2"], C),
      vec(p["g"], C), cm)


def _kern_dot864(xq_ref, w1_ref, w2_ref, out_ref):
    hid = jnp.dot(xq_ref[0], w1_ref[:], preferred_element_type=jnp.int32)
    hq = (hid >> 8).astype(jnp.int8)
    out_ref[0] = jnp.dot(hq, w2_ref[:], preferred_element_type=jnp.int32)


def dot864(xq, w1q, w2q):
    b = xq.shape[0]
    return pl.pallas_call(
        _kern_dot864,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, HWP, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, HID), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HID, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, HWP, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xq.shape, jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(xq, w1q, w2q)


def main():
    batch, iters = BATCH, 20
    rng = np.random.default_rng(0)
    x4 = rng.normal(size=(batch, H, W, C)).astype(np.float32)
    x = jnp.asarray(x4.reshape(batch, H * W, C), jnp.bfloat16)
    xp = pad_planes(jnp.asarray(x4, jnp.bfloat16))
    cm = jnp.asarray(
        (np.arange(HWP) % WP < W).astype(np.float32).reshape(HWP, 1))

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
    p = block_args(rng, 1)[0]
    dwk3 = jnp.asarray(p["dwk"], jnp.float32).reshape(49, 1, C)
    vec = lambda v, n: jnp.asarray(v, jnp.float32).reshape(1, n)

    gemm_flops = 4 * H * W * C * HID * batch

    def guard(label, thunk):
        try:
            return thunk()
        except Exception as e:
            print(f"{label} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            return None

    # correctness of the padded dwconv vs the current one
    def _corr():
        a = np.asarray(dw_cur(x, dwk3, vec(p["dwb"], C)), np.float32) \
            .reshape(batch, H, W, C)
        bpad = np.asarray(unpad_planes(dw_pad(
            xp, dwk3.reshape(1, 49, C), vec(p["dwb"], C), cm)), np.float32)
        err = np.abs(a - bpad).max()
        print(f"dw-pad max |err| vs dw-cur: {err:.3e}", flush=True)
        assert err < 2e-2, err
    guard("corr", _corr)

    guard("dw-cur", lambda: print(f"dw-cur   {timeit(dw_cur, x, dwk3, vec(p['dwb'], C), iters=iters)*1e3:8.2f} ms", flush=True))
    guard("dw-pad", lambda: print(f"dw-pad   {timeit(dw_pad, xp, dwk3.reshape(1, 49, C), vec(p['dwb'], C), cm, iters=iters)*1e3:8.2f} ms", flush=True))

    use_int8 = C >= 384
    guard("blk-cur", lambda: print(f"blk-cur  {timeit(lambda xx: fused_block_apply(xx, H, W, p['dwk'], p['dwb'], p['lns'], p['lnb'], p['w1'], p['b1'], p['w2'], p['b2'], p['g'], int8=use_int8), x, iters=iters)*1e3:8.2f} ms", flush=True))
    if use_int8:
        guard("blk-pad", lambda: print(f"blk-pad  {timeit(lambda xx: blk_pad(xx, p, cm), xp, iters=iters)*1e3:8.2f} ms", flush=True))
    else:
        guard("blk-pad-bf16", lambda: print(f"blk-pad-bf16 {timeit(lambda xx: blk_pad_bf16(xx, p, cm), xp, iters=iters)*1e3:8.2f} ms", flush=True))

    xq = jnp.asarray(rng.integers(-127, 127, (batch, HWP, C)), jnp.int8)
    w1q, _ = quantize_block_weights(p["w1"])
    w2q, _ = quantize_block_weights(p["w2"])
    t = timeit(dot864, xq, w1q, w2q, iters=iters)
    eff = 4 * HWP * C * HID * batch / t / 1e12
    print(f"dotM864  {t*1e3:8.2f} ms  {eff:6.1f} TF/s(padded M)",
          flush=True)

    # 9-block padded stage vs 9-block current stage
    ps = block_args(rng, 9)

    blk_fn = blk_pad if C >= 384 else blk_pad_bf16

    def stage_pad(xx):
        h = xx
        for p_ in ps:
            h = blk_fn(h, p_, cm)
        return h

    def stage_cur(xx):
        h = xx
        for p_ in ps:
            h = fused_block_apply(
                h, H, W, p_["dwk"], p_["dwb"], p_["lns"], p_["lnb"],
                p_["w1"], p_["b1"], p_["w2"], p_["b2"], p_["g"],
                int8=use_int8)
        return h

    nstage = {96: 3, 192: 3, 384: 9, 768: 3}[C]
    ps = ps[:nstage]
    guard("stage-cur", lambda: print(f"stage-cur({nstage}) {timeit(stage_cur, x, iters=iters)*1e3:8.2f} ms", flush=True))
    guard("stage-pad", lambda: print(f"stage-pad({nstage}) {timeit(stage_pad, xp, iters=iters)*1e3:8.2f} ms", flush=True))


if __name__ == "__main__":
    main()
