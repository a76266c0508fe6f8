"""TPU probe round 2c: fold-proof re-measurement of int8 MXU dots, and an
epilogue-cost breakdown of the packed deployment pipeline.

Lessons from bench_probe_r2b.py: a linear consumer (sum(y)) lets XLA's
algebraic simplifier rewrite reduce(dot(A,B)) into an O(n^2) expression,
eliding the dot entirely (it reported 1499 "TFLOP/s" for an int8 dot on a
394-TOPS chip). All consumers here are sums of SQUARES, which no linear
rewrite can fold. The conv numbers of r2b were real (0.140 ms is 70% MXU,
not elided), but are re-measured under the new consumer anyway.

Questions:
  Q1  Does an int8 x int8 -> int32 dot hit the v5e's 2x-rate int8 MXU mode
      through XLA? (r2b's conv answer was no - int8 convs run 2.4x SLOWER.)
  Q2  What does an im2col-shaped bf16 dot (M=64800, K=1152, N=128) run at -
      the ceiling for a hand-im2col'd Pallas kernel?
  Q3  How much of the packed pipeline's 44%-of-peak (vs the raw conv's 70%)
      is the inter-conv epilogue (saturate/bias/requant/round/int8 store)?
      Measured by chaining 5 packed convs with ONLY relu between.
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

    def conv(x, w, out_dtype=jnp.float32):
        return lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=out_dtype)

    def act(shape, dtype, hi=128):
        a = rng.integers(-hi, hi, size=shape).astype(np.float32)
        return jnp.asarray(a, dtype)

    candidates = {}

    def add(name, x, w, fn, flops):
        candidates[name] = (x, w, fn, flops)

    M = 4096
    add("dot_bf16_4096", act((M, M), jnp.bfloat16, 8),
        act((M, M), jnp.bfloat16, 8),
        lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32),
        2 * M * M * M)
    add("dot_int8_4096", act((M, M), jnp.int8), act((M, M), jnp.int8),
        lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.int32),
        2 * M * M * M)

    # im2col-shaped dot: the packed conv as one explicit GEMM
    Mi, Ki, Ni = 64800, 1152, 128
    add("dot_im2col_bf16", act((Mi, Ki), jnp.bfloat16, 8),
        act((Ki, Ni), jnp.bfloat16, 8),
        lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32),
        2 * Mi * Ki * Ni)
    add("dot_im2col_int8", act((Mi, Ki), jnp.int8), act((Ki, Ni), jnp.int8),
        lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.int32),
        2 * Mi * Ki * Ni)

    Hp, Wp, C = 272, 240, 128
    cflops = 2 * Hp * Wp * 9 * C * C
    add("conv_packed_bf16", act((1, Hp, Wp, C), jnp.bfloat16, 16),
        act((3, 3, C, C), jnp.bfloat16, 16), lambda x, w: conv(x, w), cflops)

    # Q3: 5 packed convs, relu-only boundaries (no quant epilogue)
    w5 = act((3, 3, C, C), jnp.bfloat16, 4)

    def five_convs(x, w):
        h = x
        for _ in range(5):
            h = jax.nn.relu(conv(h, w)).astype(jnp.bfloat16)
        return h

    add("pipe5_convs_relu_bf16", act((1, Hp, Wp, C), jnp.bfloat16, 2), w5,
        five_convs, 5 * cflops)

    # Q3b: same 5 convs with the REAL epilogue ops (saturate+bias+requant+
    # round+int8 cast) between them
    from sesr_tpu.ops.fixedpoint import apply_requant_f32, saturate

    bias = jnp.asarray(rng.integers(-100, 100, size=(C,)), jnp.int32)

    def five_convs_epilogue(x, w):
        h = x
        for _ in range(5):
            y = conv(h, w).astype(jnp.int32)
            y = saturate(y, 20) + bias
            f = apply_requant_f32(y, 17000, 22)
            f = jax.nn.relu(f)
            q = jnp.clip(jnp.round(f), -128, 127)
            h = q.astype(jnp.int8).astype(jnp.bfloat16)
        return h

    add("pipe5_convs_full_epilogue", act((1, Hp, Wp, C), jnp.bfloat16, 2), w5,
        five_convs_epilogue, 5 * cflops)

    results = {}
    for name, (x, w, fn, flops) in candidates.items():
        try:
            def chained(K, fn=fn, w=w):
                @jax.jit
                def f(x):
                    def body(i, c):
                        y = fn(c, w).astype(jnp.float32)
                        # fold-proof: nonlinear in y, cannot be rewritten
                        bump = (jnp.sum(y * y) * 1e-38).astype(c.dtype)
                        return c + bump
                    return lax.fori_loop(0, K, body, x)
                return f

            times = {}
            for K in (K_SHORT, K_LONG):
                f = chained(K)
                y = f(x)
                _ = float(jnp.sum(y.astype(jnp.float32)))
                t0 = time.perf_counter()
                y = f(x)
                _ = float(jnp.sum(y.astype(jnp.float32)))
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
