"""Round-3 probe C: why do unrolled/mapped per-frame subgraphs run ~9x
slower than the identical monolithic program on this backend?

r3a/r3b facts: packed mono (1,540,960,3) ~565-1300 Mpx/s, but 8 unrolled
sequential per-frame calls on (8,540,960,3) run 68, and 4 H-slab calls on
1080p run 85 — both the lax.map AND the unrolled static-slice forms, so it
is not while-loop overhead. Hypotheses, isolated here in one interleaved
session:

  H1 nested-jit call boundary: packed_slab_forward invokes the
     jax.jit-wrapped _packed_fast_impl inside a traced context; calling
     the UNJITTED body instead (same math, inlined into one graph) should
     recover the rate if call boundaries are the cost.
  H2 shape pathology: a (1,284,1920,3) slab shape is intrinsically slow —
     measured directly as a monolithic program.
  H3 slicing from a larger buffer: frame = x[i:i+1] views.

Usage: timeout 3600 python tools/bench_probe_r3c.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def measure(fn, x, reps_state, name, k_long=22):
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
    reps_state.setdefault(name, []).append(mpxs)
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
    # the unjitted body of the packed forward (same trace, no call boundary)
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
    x_hd = jax.device_put(jnp.asarray(
        rng.random((1, 1080, 1920, 3), dtype=np.float32)))
    x_slab = jax.device_put(jnp.asarray(
        rng.random((1, 284, 1920, 3), dtype=np.float32)))

    def b8_serial_jit(c):
        return jnp.concatenate(
            [_packed_fast_impl(spec, c[i:i + 1], qph, (2, 4))
             for i in range(8)], axis=0)

    def b8_serial_raw(c):
        return jnp.concatenate(
            [raw_impl(spec, c[i:i + 1], qph, (2, 4))
             for i in range(8)], axis=0)

    def b2_serial_raw(c):
        return jnp.concatenate(
            [raw_impl(spec, c[i:i + 1], qph, (2, 4))
             for i in range(2)], axis=0)

    def hd_slab_raw(c):
        # 4 H-slabs, 270 interior + 7 halo, true-boundary clamped
        R, slab_h = 7, 270
        H = 1080
        pieces = []
        for i in range(4):
            g = min(i * slab_h, H - slab_h)
            start = min(max(g - R, 0), H - (slab_h + 2 * R))
            y = raw_impl(spec, c[:, start:start + slab_h + 2 * R], qph,
                         (2, 4))
            off = (g - start) * 2
            pieces.append(y[:, off:off + slab_h * 2])
        return jnp.concatenate(pieces, axis=1)

    cands = {
        "b1_mono": (x_1, lambda c: _packed_fast_impl(spec, c, qph, (2, 4))),
        "slabshape_mono": (x_slab,
                           lambda c: _packed_fast_impl(spec, c, qph,
                                                       (2, 4))),
        "b8_batched": (x_b8, lambda c: _packed_fast_impl(spec, c, qph,
                                                         (2, 4))),
        "b8_serial_nestedjit": (x_b8, b8_serial_jit),
        "b8_serial_inlined": (x_b8, b8_serial_raw),
        "b2_serial_inlined": (jax.device_put(jnp.asarray(
            rng.random((2, 540, 960, 3), dtype=np.float32))), b2_serial_raw),
        "hd_mono": (x_hd, lambda c: _packed_fast_impl(spec, c, qph, (2, 4))),
        "hd_slab_inlined": (x_hd, hd_slab_raw),
    }
    state = {}
    print("interleaved probes, 4 reps:", flush=True)
    for rep in range(4):
        print(f"  rep {rep}:", flush=True)
        for name, (xx, fn) in cands.items():
            try:
                measure(fn, xx, state, name)
            except Exception as e:
                print(f"    {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
    print("medians:")
    for name, vals in state.items():
        print(f"  {name}: {np.median(vals):.1f} Mpx/s "
              f"({[round(v, 1) for v in vals]})")


if __name__ == "__main__":
    main()
