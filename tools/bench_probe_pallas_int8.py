"""TPU probe: does Mosaic lower int8 x int8 -> int32 jnp.dot to the MXU's
2x-rate int8 mode, and at what throughput vs the same kernel in bf16?

Separate process from bench_probe_r2c.py because Pallas remote-compile
failures (HTTP 500) can be opaque and must not kill the XLA probes.

Kernel: plain tiled GEMM, (M, K) x (K, N), accumulating over the K grid
axis into a f32/int32 VMEM scratch accumulator.
"""

from __future__ import annotations

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)

    t0 = time.time()
    log("probe: eating first-readback stall...")
    y = jax.jit(lambda x: x * 2.0)(jnp.ones((8, 128)))
    _ = float(jnp.sum(y))
    log(f"probe: stall eaten in {time.time()-t0:.0f}s")

    M = N = Kd = 4096
    BM, BK, BN = 512, 512, 512

    def mm_kernel(x_ref, w_ref, o_ref, acc_ref, *, out_dtype):
        @pl.when(pl.program_id(2) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jnp.dot(x_ref[...], w_ref[...],
                                preferred_element_type=acc_ref.dtype)

        @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(out_dtype)

    def make_mm(in_dtype, acc_dtype, out_dtype):
        grid = (M // BM, N // BN, Kd // BK)

        @jax.jit
        def mm(x, w):
            return pl.pallas_call(
                functools.partial(mm_kernel, out_dtype=out_dtype),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((BM, BK), lambda i, j, k: (i, k)),
                    pl.BlockSpec((BK, BN), lambda i, j, k: (k, j)),
                ],
                out_specs=pl.BlockSpec((BM, BN), lambda i, j, k: (i, j)),
                out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
                scratch_shapes=[pltpu.VMEM((BM, BN), acc_dtype)],
            )(x, w)

        return mm

    def act(shape, dtype, hi=8):
        a = rng.integers(-hi, hi, size=shape).astype(np.float32)
        return jnp.asarray(a, dtype)

    candidates = {
        "pallas_mm_bf16": (act((M, Kd), jnp.bfloat16), act((Kd, N), jnp.bfloat16),
                           make_mm(jnp.bfloat16, jnp.float32, jnp.float32)),
        "pallas_mm_int8": (act((M, Kd), jnp.int8), act((Kd, N), jnp.int8),
                           make_mm(jnp.int8, jnp.int32, jnp.int32)),
        "pallas_mm_int8_f32acc": (act((M, Kd), jnp.int8), act((Kd, N), jnp.int8),
                                  make_mm(jnp.int8, jnp.float32, jnp.float32)),
    }

    flops = 2 * M * N * Kd
    results = {}
    for name, (x, w, mm) in candidates.items():
        try:
            def chained(K, mm=mm, w=w):
                @jax.jit
                def f(x):
                    def body(i, c):
                        y = mm(c, w).astype(jnp.float32)
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
            msg = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
            results[name] = f"ERROR: {msg}"
            log(f"probe: {name}: FAILED {msg}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
