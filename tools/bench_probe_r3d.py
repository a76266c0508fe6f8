"""Round-3 probe D: isolate WHY >=2 packed-net subgraphs in one XLA
program collapse to ~68 Mpx/s (r3c: b2_serial == b8_serial == 68 while
b1 mono runs ~578 and the slab SHAPE alone runs ~514).

Discriminators, one interleaved session:
  - b8_first_only:  ONE subgraph fed by a slice of the carry (slice alone?)
  - b1_dup_concat:  TWO subgraphs on the SAME full input, outputs
                    concatenated (multi-subgraph + concat, no slicing)
  - b1_dup_add:     TWO subgraphs on the same input, outputs ADDED
                    (multi-subgraph, no concat)
  - b1_half_concat: ONE subgraph whose output is split and re-concatenated
                    (concat alone)
  - host_serial_b8: 8 frames as 8 SEPARATE jit dispatches chained by a
                    device-side data dependence (no readback between) —
                    the practical alternative if in-program replication is
                    the poison
  - host_slab_hd:   1080p as 4 slab dispatches, same chaining

Usage: timeout 3600 python tools/bench_probe_r3d.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def measure(fn, x, state, name, k_long=22):
    import jax
    import jax.numpy as jnp
    from jax import lax

    def chained(K):
        @jax.jit
        def f(x):
            def body(i, c):
                y = fn(c)
                return c + 1e-12 * jnp.mean(y * y)
            return lax.fori_loop(0, K, body, x)
        return f

    times = {}
    for K in (2, k_long):
        f = chained(K)
        y = f(x)
        _ = float(jnp.sum(y[:1, :2, 0, 0]))
        t0 = time.perf_counter()
        y = f(x)
        _ = float(jnp.sum(y[:1, :2, 0, 0]))
        times[K] = time.perf_counter() - t0
    per = (times[k_long] - times[2]) / (k_long - 2)
    mpxs = x.shape[0] * x.shape[1] * x.shape[2] / per / 1e6
    state.setdefault(name, []).append(mpxs)
    print(f"    {name}: {mpxs:.1f} Mpx/s", flush=True)
    return mpxs


def measure_host(step_fns, x, state, name, px, k_long=12):
    """Host-level chained dispatches: each step is a separate jit call,
    data-dependent on the previous step's device output (no readback in
    the chain); K-difference over whole chains, one readback per chain.
    px = pixels processed per chain."""
    import jax.numpy as jnp

    def chain(K, x):
        c = x
        for _ in range(K):
            for f in step_fns:
                c = f(c)
        return c

    times = {}
    for K in (2, k_long):
        y = chain(K, x)
        _ = float(jnp.sum(jnp.ravel(y)[:2]))
        t0 = time.perf_counter()
        y = chain(K, x)
        _ = float(jnp.sum(jnp.ravel(y)[:2]))
        times[K] = time.perf_counter() - t0
    per = (times[k_long] - times[2]) / (k_long - 2)
    mpxs = px / per / 1e6
    state.setdefault(name, []).append(mpxs)
    print(f"    {name}: {mpxs:.1f} Mpx/s", flush=True)
    return mpxs


def main():
    import jax
    import jax.numpy as jnp
    from sesr_tpu.config import spec_for_task
    from sesr_tpu.ops.packed import _packed_fast_impl
    from sesr_tpu.quant.integer import _hashable
    from sesr_tpu.quant.params import QuantParams

    spec = spec_for_task("sr_x2")
    qp = QuantParams.load(os.path.join(REPO, "artifacts",
                                       "qparams_sr_x2.npz"))
    qph = _hashable(qp)
    raw_impl = _packed_fast_impl.__wrapped__

    t0 = time.time()
    print("warmup readback...", flush=True)
    y = jax.jit(lambda x: x * 2.0)(jnp.ones((8, 128)))
    _ = float(jnp.sum(y))
    print(f"done in {time.time() - t0:.0f}s", flush=True)

    rng = np.random.default_rng(0)
    x_1 = jax.device_put(jnp.asarray(
        rng.random((1, 540, 960, 3), dtype=np.float32)))
    x_b8 = jax.device_put(jnp.asarray(
        rng.random((8, 540, 960, 3), dtype=np.float32)))

    def first_only(c):
        return raw_impl(spec, c[0:1], qph, (2, 4))

    def dup_concat(c):
        a = raw_impl(spec, c, qph, (2, 4))
        b = raw_impl(spec, c + 1e-6, qph, (2, 4))
        return jnp.concatenate([a, b], axis=0)

    def dup_add(c):
        a = raw_impl(spec, c, qph, (2, 4))
        b = raw_impl(spec, c + 1e-6, qph, (2, 4))
        return a + b

    def half_concat(c):
        y = raw_impl(spec, c, qph, (2, 4))
        return jnp.concatenate([y[:, :540], y[:, 540:]], axis=1)

    cands = {
        "b1_mono": (x_1, lambda c: _packed_fast_impl(spec, c, qph, (2, 4))),
        "b8_first_only": (x_b8, first_only),
        "b1_dup_concat": (x_1, dup_concat),
        "b1_dup_add": (x_1, dup_add),
        "b1_half_concat": (x_1, half_concat),
    }
    state = {}
    print("interleaved in-program probes, 4 reps:", flush=True)
    for rep in range(4):
        print(f"  rep {rep}:", flush=True)
        for name, (xx, fn) in cands.items():
            try:
                measure(fn, xx, state, name)
            except Exception as e:
                print(f"    {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
    for name, vals in state.items():
        print(f"  median {name}: {np.median(vals):.1f} "
              f"({[round(v, 1) for v in vals]})", flush=True)

    # host-level chained dispatch variants
    print("host-level chained dispatches:", flush=True)
    frame = jax.jit(lambda c: _packed_fast_impl(spec, c, qph, (2, 4)))

    def frame_step(c):
        y = frame(c)
        return c + 1e-12 * jnp.mean(y * y)

    state2 = {}
    for rep in range(4):
        print(f"  rep {rep}:", flush=True)
        # one frame per chain-step: rate of back-to-back b1 dispatches
        measure_host([frame_step], x_1, state2, "host_serial_b1",
                     540 * 960)
        measure_host([frame_step] * 8, x_1, state2, "host_serial_8x",
                     8 * 540 * 960)
    for name, vals in state2.items():
        print(f"  median {name}: {np.median(vals):.1f} "
              f"({[round(v, 1) for v in vals]})", flush=True)


if __name__ == "__main__":
    main()
