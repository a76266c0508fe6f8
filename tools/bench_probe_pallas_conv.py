"""TPU probe: Pallas packed-conv tile strategies, bf16 vs int8.

bench_probe_pallas_int8.py established Mosaic int8 matmuls run at ~269
TFLOP/s (1.85x its bf16 rate, int32 accumulator required). The shipped
Pallas packed kernel (ops/pallas_packed.py, 419 Mpx/s) is RELAYOUT-bound:
its in-VMEM im2col does 3 sublane rolls + 3 lane-concats per conv on
f32/bf16 data. int8 shrinks those bytes 4x/2x and doubles the MXU rate —
IF Mosaic can roll/concat int8 (CLAUDE.md recorded pltpu.roll as
"32-bit-only"; re-tested here since that note predates these shapes).

Each variant is one pallas_call with a sequential grid of ITERS steps; a
VMEM scratch carries the activation across steps (TPU grids execute
sequentially), so each step is one full 3x3 C->C conv on an (E_H, E_W, C)
tile and steps cannot overlap or elide. Variants:

  v1_bf16_concat3   rolls + lane-concat + 3 dots (the shipped kernel's form)
  v2_int8_concat3   same form on int8 data, int8 dots
  v3_int8_dot9      9 rolled int8 copies, 9 K=128 int8 dots, no concat
  v4_bf16_dot9      control: 9 dots in bf16 (isolates concat cost)
  v5_int8_mm        upper bound: one (M,1152)x(1152,128) int8 dot, no im2col
  v6_bf16_mm        upper bound: same in bf16
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

E_H, E_W, C = 48, 72, 128
ITERS = 50
K_SHORT, K_LONG = 2, 12


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)

    t0 = time.time()
    log("probe: eating first-readback stall...")
    y = jax.jit(lambda x: x * 2.0)(jnp.ones((8, 128)))
    _ = float(jnp.sum(y))
    log(f"probe: stall eaten in {time.time()-t0:.0f}s")

    def roll_neg(a, d, axis):
        n = a.shape[axis]
        return pltpu.roll(a, (n - d) % n, axis)

    M = E_H * E_W

    def write_back(x_ref, acc):
        if x_ref.dtype == jnp.int8:
            x_ref[...] = jnp.clip(acc, -128, 127).astype(jnp.int8)
        else:
            x_ref[...] = (acc * 1e-3).astype(x_ref.dtype)

    # ---- conv-step bodies (x: (E_H, E_W, C) scratch) ----
    def step_concat3(x_ref, w_ref, dot_dtype, acc_dtype):
        x = x_ref[...]
        acc = None
        for qy in range(3):
            row = x if qy == 1 else roll_neg(x, qy - 1, 0)
            patch = jnp.concatenate(
                [(row if qx == 1 else roll_neg(row, qx - 1, 1))
                 .astype(dot_dtype) for qx in range(3)], axis=2)
            d = jnp.dot(patch.reshape(M, 3 * C), w_ref[qy],
                        preferred_element_type=acc_dtype)
            acc = d if acc is None else acc + d
        write_back(x_ref, acc.reshape(E_H, E_W, C))

    def step_dot9(x_ref, w_ref, dot_dtype, acc_dtype):
        x = x_ref[...]
        acc = None
        for qy in range(3):
            row = x if qy == 1 else roll_neg(x, qy - 1, 0)
            for qx in range(3):
                t = row if qx == 1 else roll_neg(row, qx - 1, 1)
                d = jnp.dot(t.astype(dot_dtype).reshape(M, C),
                            w_ref[3 * qy + qx],
                            preferred_element_type=acc_dtype)
                acc = d if acc is None else acc + d
        write_back(x_ref, acc.reshape(E_H, E_W, C))

    def step_mm(x_ref, w_ref, dot_dtype, acc_dtype):
        # no im2col: straight (M/9, 9C) x (9C, C) on a re-viewed scratch —
        # the same matmul shape as one conv's im2col'd dot, minus the im2col
        x = x_ref[...]
        d = jnp.dot(x.reshape(M // 9, 9 * C).astype(dot_dtype), w_ref[...],
                    preferred_element_type=acc_dtype)
        acc = jnp.concatenate([d] * 9, axis=1).reshape(E_H, E_W, C)
        write_back(x_ref, acc.astype(acc_dtype))

    def make(body, xdtype, wshape, wdtype, dot_dtype, acc_dtype):
        def kernel(x_in, w_ref, o_ref, x_ref):
            @pl.when(pl.program_id(0) == 0)
            def _():
                x_ref[...] = x_in[...]

            body(x_ref, w_ref, dot_dtype=dot_dtype, acc_dtype=acc_dtype)

            @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
            def _():
                o_ref[...] = x_ref[...].astype(jnp.float32)

        @jax.jit
        def run(x, w):
            return pl.pallas_call(
                kernel, grid=(ITERS,),
                in_specs=[
                    pl.BlockSpec(x.shape, lambda i: (0,) * x.ndim),
                    pl.BlockSpec(wshape, lambda i: (0,) * len(wshape)),
                ],
                out_specs=pl.BlockSpec((E_H, E_W, C), lambda i: (0, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((E_H, E_W, C), jnp.float32),
                scratch_shapes=[pltpu.VMEM((E_H, E_W, C), xdtype)],
            )(x, jnp.asarray(w, wdtype))

        return run

    def xdata(dtype):
        return jnp.asarray(rng.integers(-3, 4, size=(E_H, E_W, C)), dtype)

    def wdata(shape):
        return rng.integers(-2, 3, size=shape).astype(np.float32)

    conv_flops = 2 * M * 9 * C * C * ITERS
    candidates = {
        "v1_bf16_concat3": (xdata(jnp.bfloat16), wdata((3, 3 * C, C)),
                            make(step_concat3, jnp.bfloat16, (3, 3 * C, C),
                                 jnp.bfloat16, jnp.bfloat16, jnp.float32),
                            conv_flops),
        "v2_int8_concat3": (xdata(jnp.int8), wdata((3, 3 * C, C)),
                            make(step_concat3, jnp.int8, (3, 3 * C, C),
                                 jnp.int8, jnp.int8, jnp.int32),
                            conv_flops),
        "v3_int8_dot9": (xdata(jnp.int8), wdata((9, C, C)),
                         make(step_dot9, jnp.int8, (9, C, C),
                              jnp.int8, jnp.int8, jnp.int32),
                         conv_flops),
        "v4_bf16_dot9": (xdata(jnp.bfloat16), wdata((9, C, C)),
                         make(step_dot9, jnp.bfloat16, (9, C, C),
                              jnp.bfloat16, jnp.bfloat16, jnp.float32),
                         conv_flops),
        "v5_int8_mm": (xdata(jnp.int8), wdata((9 * C, C)),
                       make(step_mm, jnp.int8, (9 * C, C),
                            jnp.int8, jnp.int8, jnp.int32),
                       conv_flops // 9),
        "v6_bf16_mm": (xdata(jnp.bfloat16), wdata((9 * C, C)),
                       make(step_mm, jnp.bfloat16, (9 * C, C),
                            jnp.bfloat16, jnp.bfloat16, jnp.float32),
                       conv_flops // 9),
    }

    results = {}
    for name, (x, w, run, flops) in candidates.items():
        try:
            def chained(K, run=run, w=w):
                @jax.jit
                def f(x):
                    def body(i, c):
                        y = run(c, w)
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
            msg = str(e).splitlines()[0][:160] if str(e) else type(e).__name__
            results[name] = f"ERROR: {msg}"
            log(f"probe: {name}: FAILED {msg}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
