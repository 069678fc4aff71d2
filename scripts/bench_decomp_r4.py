"""Round-4 truthful decomposition of the serving forward (static scales).

The round-3 marginal table (BENCH_NOTES.md) was measured with dynamic
quantization and cumulative-difference attribution; sum-reduced isolated
timing (this script) shows the stem/ds segments are already near floor
(stem 2.15 ms, ds1 1.64 — the r3 "18.57 stem+stage1 / 3.02 ds1" split
overstated them). This script times every segment of the CURRENT static
-scale int8 path in isolation, with outputs reduced inside jit so the
remote-tunnel transfer never pollutes the numbers.

Run on the real TPU: python scripts/bench_decomp_r4.py
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

from count_pipnet_tpu.models import convnext_tiny_26_features
from count_pipnet_tpu.models.quantized import (
    _conv, _layer_norm, calibrate_act_scales, fused_block_convnext_apply,
)
from count_pipnet_tpu.ops.pallas.fused_block import (
    fused_block_apply, fused_block_apply_padded, pad_planes, unpad_planes,
)


def timeit(fn, *args, iters=30):
    jax.device_get(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.device_get(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    batch = 256
    model = convnext_tiny_26_features(num_stages=7, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch, 224, 224, 3)).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0)}, x[:1])["params"]
    x_cal = x[:64]
    act_scales = jax.device_get(jax.jit(
        lambda p, v: calibrate_act_scales(p, v, num_stages=7))(
            params, x_cal))

    def red(f):
        return jax.jit(lambda *a: f(*a).astype(jnp.float32).sum())

    # end-to-end current path
    full = red(lambda p, v: fused_block_convnext_apply(
        p, v, stride_threshold=100, num_stages=7, act_scales=act_scales))
    print(f"FULL backbone (static int8):    {timeit(full, params, x):7.2f} ms",
          flush=True)

    # stage inputs, captured once
    def upto(p, v, ns):
        return fused_block_convnext_apply(
            p, v, stride_threshold=100, num_stages=ns,
            act_scales=act_scales)

    h1 = jax.jit(lambda p, v: _layer_norm(
        _conv(v, p["features_0"]["conv"]["kernel"],
              p["features_0"]["conv"]["bias"], 4, jnp.bfloat16),
        p["features_0"]["norm"]["scale"], p["features_0"]["norm"]["bias"])
        .astype(jnp.bfloat16))(params, x)          # stage1 input
    s1_out = jax.jit(lambda p, v: upto(p, v, 1))(params, x)
    s2_in = jax.jit(lambda p, v: upto(p, v, 2))(params, x)
    s2_out = jax.jit(lambda p, v: upto(p, v, 3))(params, x)
    s3_in = jax.jit(lambda p, v: upto(p, v, 4))(params, x)
    s3_out = jax.jit(lambda p, v: upto(p, v, 5))(params, x)
    s4_in = jax.jit(lambda p, v: upto(p, v, 6))(params, x)

    stem = red(lambda p, v: _layer_norm(
        _conv(v, p["features_0"]["conv"]["kernel"],
              p["features_0"]["conv"]["bias"], 4, jnp.bfloat16),
        p["features_0"]["norm"]["scale"], p["features_0"]["norm"]["bias"])
        .astype(jnp.bfloat16))
    print(f"stem conv+LN:                   {timeit(stem, params, x):7.2f} ms",
          flush=True)

    padun = red(lambda v: unpad_planes(pad_planes(v), 56, 56))
    print(f"pad+unpad (56^2 planes):        {timeit(padun, h1):7.2f} ms",
          flush=True)

    def stage(p, v, feat_idx, n_blocks, hh, ww, padded, int8=True):
        if padded:
            xp = pad_planes(v)
            for j in range(n_blocks):
                blk = p[f"features_{feat_idx}_block_{j}"]
                sc = act_scales.get(f"features_{feat_idx}_block_{j}")
                xp = fused_block_apply_padded(
                    xp, hh, ww, blk["dwconv"]["kernel"],
                    blk["dwconv"]["bias"], blk["norm"]["scale"],
                    blk["norm"]["bias"], blk["pw1"]["kernel"],
                    blk["pw1"]["bias"], blk["pw2"]["kernel"],
                    blk["pw2"]["bias"], blk["layer_scale"], int8=int8,
                    act_scales=sc)
            return unpad_planes(xp, hh, ww)
        b = v.shape[0]
        flat = v.reshape(b, hh * ww, v.shape[-1])
        for j in range(n_blocks):
            blk = p[f"features_{feat_idx}_block_{j}"]
            sc = act_scales.get(f"features_{feat_idx}_block_{j}")
            flat = fused_block_apply(
                flat, hh, ww, blk["dwconv"]["kernel"], blk["dwconv"]["bias"],
                blk["norm"]["scale"], blk["norm"]["bias"],
                blk["pw1"]["kernel"], blk["pw1"]["bias"],
                blk["pw2"]["kernel"], blk["pw2"]["bias"],
                blk["layer_scale"], int8=int8, act_scales=sc)
        return flat.reshape(v.shape)

    for name, vin, fi, nb, hh, ww in [
            ("stage1 (3 blk, 56^2x96)", h1, 1, 3, 56, 56),
            ("stage2 (3 blk, 28^2x192)", s2_in, 3, 3, 28, 28),
            ("stage3 (9 blk, 27^2x384)", s3_in, 5, 9, 27, 27),
    ]:
        tp = timeit(red(lambda p, v, fi=fi, nb=nb, hh=hh, ww=ww:
                        stage(p, v, fi, nb, hh, ww, True)), params, vin)
        tf = timeit(red(lambda p, v, fi=fi, nb=nb, hh=hh, ww=ww:
                        stage(p, v, fi, nb, hh, ww, False)), params, vin)
        print(f"{name}: padded {tp:7.2f} ms   flat {tf:7.2f} ms", flush=True)

    t4 = timeit(red(lambda p, v: stage(p, v, 7, 3, 26, 26, False)),
                params, s4_in)
    print(f"stage4 (3 blk, 26^2x768) flat:  {t4:7.2f} ms", flush=True)

    ds = red(lambda p, v, scope, stride: _conv(
        _layer_norm(v, p[scope]["norm"]["scale"],
                    p[scope]["norm"]["bias"]).astype(jnp.bfloat16),
        p[scope]["conv"]["kernel"], p[scope]["conv"]["bias"], stride,
        jnp.bfloat16))
    for name, vin, scope, stride in [
            ("ds1 (56->28, 96->192)", s1_out, "features_2", 2),
            ("ds2 (28->14.. sic 27, 192->384)", s2_out, "features_4", 2),
            ("ds3 (27->26 s1, 384->768)", s3_out, "features_6", 1)]:
        print(f"{name}: {timeit(lambda p, v, s=scope, st=stride: ds(p, v, s, st), params, vin):7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
