"""Round-4 probe E — decompose the non-conv-core overhead of the packed
deployment path at the shipped (1,8) geometry, ONE process, interleaved.

The r2d cost decomposition put the conv core (5 convs + quant epilogue)
at 0.509 ms/frame (1019 Mpx/s-equivalent) while the full path serves
~0.75-0.80 ms; this probe measures the remaining pieces as standalone
programs so the budget is accounted:

  full_f32      the product program (control)
  full_int8out  minus the full-res f32 dequant+write (the int8 contract)
  full_wide     narrow boundary stores OFF (the int8/int16 store win)
  entry_only    quantize + space_to_depth + int8 store
  exit_only     d2s∘PixelShuffle permutation + dequant + f32 write

Tiny programs use a longer K (per-iteration cost ~tens of us; the
K-difference needs the in-loop total well above timer noise).

Usage: timeout 3600 python tools/bench_probe_r4e.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

REPS = 5


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sesr_tpu.config import spec_for_task
    from sesr_tpu.ops.packed import (_packed_fast_impl, depth_to_space_nhwc,
                                     packed_to_image_nhwc,
                                     space_to_depth_nhwc)
    from sesr_tpu.quant.integer import _hashable
    from sesr_tpu.quant.params import QuantParams

    spec = spec_for_task("sr_x2")
    qp = _hashable(QuantParams.load(
        os.path.join(REPO, "artifacts", "qparams_sr_x2.npz")))
    L = spec.num_convs
    s0, z0 = float(qp.a_scale[0]), float(qp.a_zero[0])
    sL, zL = float(qp.a_scale[L]), float(qp.a_zero[L])

    t0 = time.time()
    log("probe: eating first-readback stall...")
    y = jax.jit(lambda x: x * 2.0)(jnp.ones((8, 128)))
    _ = float(jnp.sum(y))
    log(f"probe: stall eaten in {time.time()-t0:.0f}s")

    rng = np.random.default_rng(0)
    x_img = jax.device_put(jnp.asarray(
        rng.random((1, 540, 960, 3), dtype=np.float32)))
    # exit-only carry: a packed final-conv output (540 x 120 cells, 8*16
    # packed channels), float-valued ints like the real program's
    x_pk = jax.device_put(jnp.asarray(rng.integers(
        -128, 128, (1, 540, 120, 8 * 16)).astype(np.float32)))

    def entry_only(c):
        q = jnp.clip(jnp.round(c / jnp.float32(s0) + jnp.float32(z0)),
                     -128.0, 127.0)
        return space_to_depth_nhwc(q, (1, 8)).astype(jnp.int8)

    def exit_only(c):
        # the product exit: int8 through the fused d2s∘PixelShuffle
        # permutation, then dequant to the f32 output contract
        img = packed_to_image_nhwc(c.astype(jnp.int8), (1, 8),
                                   spec.scaling_factor)
        return (img.astype(jnp.float32) - jnp.float32(zL)) * jnp.float32(sL)

    candidates = {
        "full_f32": (x_img, 22,
                     lambda c: _packed_fast_impl(spec, c, qp, (1, 8))),
        "full_int8out": (x_img, 22,
                         lambda c: _packed_fast_impl(
                             spec, c, qp, (1, 8), True, None, "int8")
                         .astype(jnp.float32)),
        "full_wide": (x_img, 22,
                      lambda c: _packed_fast_impl(spec, c, qp, (1, 8),
                                                  False)),
        "entry_only": (x_img, 402, entry_only),
        "exit_only": (x_pk, 402, exit_only),
    }

    def make_runner(x, k_long, fn):
        ks = (2, k_long)
        fns = {}
        for K in ks:
            @jax.jit
            def f(x, K=K):
                def body(i, c):
                    y = fn(c)
                    return c + 1e-12 * jnp.mean(
                        y.astype(jnp.float32) * y.astype(jnp.float32))
                return lax.fori_loop(0, K, body, x)
            fns[K] = f

        def run():
            times = {}
            for K in ks:
                y = fns[K](x)
                _ = float(jnp.sum(y[:1, :2, 0, 0]))
                t0 = time.perf_counter()
                y = fns[K](x)
                _ = float(jnp.sum(y[:1, :2, 0, 0]))
                times[K] = time.perf_counter() - t0
            per = (times[ks[1]] - times[ks[0]]) / (ks[1] - ks[0])
            return per * 1e6        # us per iteration
        return run

    runners = {n: make_runner(x, k, fn)
               for n, (x, k, fn) in candidates.items()}
    results = {n: [] for n in candidates}
    for rep in range(REPS):
        for name in candidates:
            v = runners[name]()
            results[name].append(v)
            log(f"rep {rep} {name}: {v:.1f} us/frame")

    import statistics
    summary = {}
    for name, vals in results.items():
        med = statistics.median(vals)
        summary[name] = {"median_us": round(med, 1),
                         "mpxs": round(540 * 960 / med, 1),
                         "reps_us": [round(v, 1) for v in vals]}
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
