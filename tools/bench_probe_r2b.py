"""TPU probe: native int8 MXU + strided (output-packed) conv lowerings.

Two hypotheses for the next deployment-path speedup beyond the shipped
channel-packed XLA path (ops/packed.py, ~603 Mpx/s at 2x4 cells):

1. int8 x int8 -> int32 on the MXU. The v5e's int8 peak is 2x bf16
   (394 TOPS vs 197 TFLOP/s). If XLA lowers integer convs/dots to the MXU
   (CLAUDE.md only established that int32 INPUTS go to the VPU), the same
   packed lowering could run ~2x faster and sheds the 2^24 f32-exactness
   ceiling entirely.

2. Output-packed strided conv: express each layer as a stride-(s_h, s_w)
   conv with an inflated (k+s_h-1, k+s_w-1) kernel producing the packed
   (cells*OC) channels directly from the UNPACKED input. FLOP inflation is
   (k+s_h-1)(k+s_w-1)/k^2 = 2.67x for k=3 at 2x4 (vs 8x for the dense
   packed kernel) and 1.92x for k=5 (vs 2.88x) -- 3x fewer FLOPs on the
   dominant k=3 layers IF XLA can keep the MXU full with IC=16 input
   channels (contraction per tap is only 16, so this hinges on XLA's own
   space-to-depth / im2col rewrite kicking in).

Same honest K-difference protocol as bench.py. Prints one line per
candidate to stderr and a JSON dict to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K_SHORT, K_LONG = 2, 22


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)

    t0 = time.time()
    log("probe: eating first-readback stall...")
    y = jax.jit(lambda x: x * 2.0)(jnp.ones((8, 128)))
    _ = float(jnp.sum(y))
    log(f"probe: stall eaten in {time.time()-t0:.0f}s")

    def conv(x, w, strides=(1, 1), out_dtype=jnp.float32):
        return lax.conv_general_dilated(
            x, w, window_strides=strides, padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=out_dtype)

    def conv_valid(x, w, strides=(1, 1), out_dtype=jnp.float32):
        return lax.conv_general_dilated(
            x, w, window_strides=strides, padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=out_dtype)

    # int8-valued test data (the real datapath's ranges)
    def act(shape, dtype):
        a = rng.integers(-128, 128, size=shape).astype(np.float32)
        return jnp.asarray(a, dtype)

    def wgt(shape, dtype):
        a = rng.integers(-64, 64, size=shape).astype(np.float32)
        return jnp.asarray(a, dtype)

    candidates = {}

    def add(name, x, w, fn, flops):
        candidates[name] = (x, w, fn, flops)

    # --- raw matmul roofline: bf16 vs int8 ---
    M = 4096
    add("dot_bf16_4096", act((M, M), jnp.bfloat16), wgt((M, M), jnp.bfloat16),
        lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32),
        2 * M * M * M)
    add("dot_int8_4096", act((M, M), jnp.int8), wgt((M, M), jnp.int8),
        lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.int32),
        2 * M * M * M)

    # --- packed-shape conv (the shipped lowering's hot op) ---
    # sr_x2 540x960 at 2x4 cells -> 272x240 grid (H padded), C=128, T=3x3
    Hp, Wp, C = 272, 240, 128
    xs = (1, Hp, Wp, C)
    ws = (3, 3, C, C)
    cflops = 2 * Hp * Wp * 9 * C * C
    add("conv_packed_bf16", act(xs, jnp.bfloat16), wgt(ws, jnp.bfloat16),
        lambda x, w: conv(x, w), cflops)
    add("conv_packed_int8", act(xs, jnp.int8), wgt(ws, jnp.int8),
        lambda x, w: conv(x, w, out_dtype=jnp.int32), cflops)

    # --- strided output-packed lowering: k=3 layer, 16->16 ch, 2x4 cells ---
    H, W, IC, OC = 544, 960, 16, 16
    cells = 8
    xs = (1, H, W, IC)
    ws = (4, 6, IC, cells * OC)
    sflops = 2 * (H // 2) * (W // 4) * 4 * 6 * IC * cells * OC
    add("conv_strided_k3_bf16", act(xs, jnp.bfloat16), wgt(ws, jnp.bfloat16),
        lambda x, w: conv_valid(x, w, strides=(2, 4)), sflops)
    add("conv_strided_k3_int8", act(xs, jnp.int8), wgt(ws, jnp.int8),
        lambda x, w: conv_valid(x, w, strides=(2, 4), out_dtype=jnp.int32),
        sflops)

    # k=5 layer
    ws5 = (6, 8, IC, cells * OC)
    s5flops = 2 * (H // 2) * (W // 4) * 6 * 8 * IC * cells * OC
    add("conv_strided_k5_bf16", act(xs, jnp.bfloat16), wgt(ws5, jnp.bfloat16),
        lambda x, w: conv_valid(x, w, strides=(2, 4)), s5flops)

    results = {}
    for name, (x, w, fn, flops) in candidates.items():
        try:
            def chained(K, fn=fn, w=w):
                @jax.jit
                def f(x):
                    def body(i, c):
                        y = fn(c, w)
                        bump = (jnp.sum(y.astype(jnp.float32)) * 1e-30
                                ).astype(c.dtype)
                        return c + bump
                    return lax.fori_loop(0, K, body, x)
                return f

            times = {}
            for K in (K_SHORT, K_LONG):
                f = chained(K)
                y = f(x)
                _ = float(jnp.sum(y[:1].astype(jnp.float32)))
                t0 = time.perf_counter()
                y = f(x)
                _ = float(jnp.sum(y[:1].astype(jnp.float32)))
                times[K] = time.perf_counter() - t0
            per_it = (times[K_LONG] - times[K_SHORT]) / (K_LONG - K_SHORT)
            tflops = flops / per_it / 1e12
            results[name] = round(tflops, 1)
            log(f"probe: {name}: {tflops:.1f} TFLOP/s ({per_it*1e3:.3f} ms)")
        except Exception as e:
            results[name] = f"ERROR: {type(e).__name__}: {e}"
            log(f"probe: {name}: FAILED {type(e).__name__}: {e}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
