"""Op-level cost profile of the fused Count-PIPNet inference forward.

Times each op class at its exact shape (batch 256, 224x224 input,
convnext_tiny_26 stride surgery), so perf work targets the real hot spots.
Run alone (single TPU client):

    python scripts/bench_ops.py [--batch 256] [--iters 10]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from count_pipnet_tpu.models.quantized import _conv, _dwconv7, _layer_norm
    from count_pipnet_tpu.ops.pallas.fused_mlp import fused_ln_mlp_residual

    rng = np.random.default_rng(0)
    B = args.batch

    def timeit(f, *xs, iters=args.iters):
        g = jax.jit(lambda *a: jnp.sum(f(*a).astype(jnp.float32)))
        jax.device_get(g(*xs))
        t0 = time.perf_counter()
        for _ in range(iters):
            r = g(*xs)
        jax.device_get(r)
        return (time.perf_counter() - t0) / iters

    def arr(*shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32), dtype)

    # (H, W, C, n_blocks) after stride surgery at 224 input
    stages = [(56, 56, 96, 3), (28, 28, 192, 3), (27, 27, 384, 9),
              (26, 26, 768, 3)]

    total = 0.0
    # stem: conv 4x4 stride 4 + LN
    x = arr(B, 224, 224, 3)
    k = arr(4, 4, 3, 96)
    b = arr(96, dtype=jnp.float32)
    s = arr(96, dtype=jnp.float32)
    t = timeit(lambda x, k, b, s: _layer_norm(
        _conv(x, k, b, 4, jnp.bfloat16), s, b), x, k, b, s)
    print(f"stem conv4x4/4 + LN  [{B},224,224,3]->[56,56,96]: "
          f"{t*1e3:7.2f} ms")
    total += t

    prev_c = 96
    for i, (h, w, c, n_blocks) in enumerate(stages):
        if i > 0:
            stride = 2 if prev_c <= 100 else 1
            hin = stages[i - 1][0]
            win = stages[i - 1][1]
            x = arr(B, hin, win, prev_c)
            k = arr(2, 2, prev_c, c)
            b = arr(c, dtype=jnp.float32)
            sc = arr(prev_c, dtype=jnp.float32)
            bi = arr(prev_c, dtype=jnp.float32)
            t = timeit(lambda x, k, b, sc, bi: _conv(
                _layer_norm(x, sc, bi).astype(jnp.bfloat16), k, b, stride,
                jnp.bfloat16), x, k, b, sc, bi)
            print(f"downsample{i} LN+conv2x2/{stride} "
                  f"[{hin},{win},{prev_c}]->[{h},{w},{c}]: {t*1e3:7.2f} ms")
            total += t

        x = arr(B, h, w, c)
        dk = arr(7, 7, 1, c)
        db = arr(c, dtype=jnp.float32)
        t_dw = timeit(lambda x, dk, db: _dwconv7(x, dk, db, jnp.bfloat16),
                      x, dk, db)
        print(f"stage{i+1} dwconv7x7 [{B},{h},{w},{c}] x{n_blocks}: "
              f"{t_dw*1e3:7.2f} ms each = {t_dw*n_blocks*1e3:7.2f} ms")
        total += t_dw * n_blocks

        hdim = 4 * c
        ls = arr(c, dtype=jnp.float32)
        lb = arr(c, dtype=jnp.float32)
        w1 = arr(c, hdim)
        b1 = arr(hdim, dtype=jnp.float32)
        w2 = arr(hdim, c)
        b2 = arr(c, dtype=jnp.float32)
        g = arr(c, dtype=jnp.float32)
        y = arr(B, h, w, c)
        t_mlp = timeit(functools.partial(fused_ln_mlp_residual), y, x, ls,
                       lb, w1, b1, w2, b2, g)
        gflop = 2 * 2 * B * h * w * c * hdim / 1e9
        print(f"stage{i+1} fusedMLP  [{B},{h},{w},{c}] x{n_blocks}: "
              f"{t_mlp*1e3:7.2f} ms each = {t_mlp*n_blocks*1e3:7.2f} ms "
              f"({gflop/t_mlp/1e3:5.1f} TF/s)")
        total += t_mlp * n_blocks
        prev_c = c

    print(f"--- sum of parts: {total*1e3:.1f} ms "
          f"({B/total:.0f} img/s)")


if __name__ == "__main__":
    main()
