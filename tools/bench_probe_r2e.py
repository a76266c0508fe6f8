"""TPU probe: conv as 9 shifted int8 DOTS through XLA.

bench_probe_r2c.py established: XLA int8 dots hit the MXU's fast int8 mode
(274 TFLOP/s vs 184 bf16), but XLA int8 CONVS fall off a cliff (58) and
Pallas can't roll sub-32-bit data. Remaining idea: express the packed 3x3
conv as 9 statically-shifted (M, 128) x (128, 128) int8 dots at the XLA
level and let the compiler fuse each slice into its dot's operand load.
If XLA materializes the 9 shifted copies instead, HBM traffic (~150 MB
per conv) will show up as a low rate and the idea is dead.

VERDICT (bench_probe_r2f.py, interleaved A/B x4): REFUTED — the first
run's pipe5_dot9_int8 168.7 vs pipe5_conv_bf16 144.5 was cross-run chip
drift; interleaved medians are conv_bf16 164.3 vs dot9_int8 120.7. The
shipped lax.conv bf16 lowering stays. Never compare lowerings across
separate probe runs on this chip — interleave them.

Variants (all on the packed deployment shape, (272, 240, 128)):
  dot9_int8        one conv as 9 shifted int8 dots, int32 accumulate
  dot9_bf16        control: same structure in bf16 (isolates int8 gain)
  conv_bf16        control: the shipped lax.conv lowering
  pipe5_dot9_int8  5 chained convs in the dot9-int8 form with the real
                   quant epilogue (steady-state, weights resident)
  pipe5_conv_bf16  control: the shipped form, same epilogue
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K_SHORT, K_LONG = 2, 22
Hp, Wp, C = 272, 240, 128
M = Hp * Wp


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
            x[None], w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=out_dtype)[0]

    def dot9(x, w9, dot_dtype, acc_dtype):
        """x: (Hp, Wp, C); w9: (9, C, C). SAME 3x3 conv via 9 shifted dots
        on a zero-padded buffer; slices have static offsets."""
        xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
        acc = None
        for qy in range(3):
            for qx in range(3):
                patch = lax.dynamic_slice(xp, (qy, qx, 0), (Hp, Wp, C))
                d = jnp.dot(patch.reshape(M, C).astype(dot_dtype),
                            w9[3 * qy + qx],
                            preferred_element_type=acc_dtype)
                acc = d if acc is None else acc + d
        return acc.reshape(Hp, Wp, C)

    def act(dtype, hi=4):
        return jnp.asarray(rng.integers(-hi, hi + 1, (Hp, Wp, C)), dtype)

    def wgt(shape, dtype, hi=3):
        return jnp.asarray(rng.integers(-hi, hi + 1, shape), dtype)

    from sesr_tpu.ops.fixedpoint import apply_requant_f32, saturate

    def pipe5(x, w9, form):
        h = x
        for _ in range(5):
            if form == "dot9_int8":
                y = dot9(h, w9, jnp.int8, jnp.int32)
            elif form == "dot9_bf16":
                y = dot9(h, w9, jnp.bfloat16, jnp.float32).astype(jnp.int32)
            else:
                y = conv(h.astype(jnp.bfloat16), w9.reshape(3, 3, C, C)
                         .astype(jnp.bfloat16)).astype(jnp.int32)
            y = saturate(y, 20)
            f = apply_requant_f32(y, 17000, 22)
            q = jnp.clip(jnp.round(jax.nn.relu(f)), -128, 127)
            h = q.astype(jnp.int8) if form == "dot9_int8" \
                else q.astype(jnp.int8).astype(jnp.float32)
        return h

    cflops = 2 * M * 9 * C * C
    candidates = {
        "dot9_int8": (act(jnp.int8), wgt((9, C, C), jnp.int8),
                      lambda x, w: dot9(x, w, jnp.int8, jnp.int32), cflops),
        "dot9_bf16": (act(jnp.bfloat16), wgt((9, C, C), jnp.bfloat16),
                      lambda x, w: dot9(x, w, jnp.bfloat16, jnp.float32),
                      cflops),
        "conv_bf16": (act(jnp.bfloat16), wgt((3, 3, C, C), jnp.bfloat16),
                      lambda x, w: conv(x, w), cflops),
        "pipe5_dot9_int8": (act(jnp.int8), wgt((9, C, C), jnp.int8),
                            lambda x, w: pipe5(x, w, "dot9_int8"),
                            5 * cflops),
        "pipe5_conv_bf16": (act(jnp.float32), wgt((9, C, C), jnp.float32),
                            lambda x, w: pipe5(x, w, "conv"), 5 * cflops),
    }

    results = {}
    for name, (x, w, fn, flops) in candidates.items():
        try:
            def chained(K, fn=fn, w=w):
                @jax.jit
                def f(x):
                    def body(i, c):
                        y = fn(c, w).astype(jnp.float32)
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
