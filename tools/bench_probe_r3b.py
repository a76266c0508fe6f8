"""Round-3 probe B (follow-up to r3a, same protocol):

1. slab tiling variants at 1080p: the lax.map while-loop form measured a
   pathological 86 Mpx/s (r3a) — probe the UNROLLED form (independent
   static-sliced subgraphs) against monolithic, plus batch-8 serial
   unrolled vs batched.
2. Mosaic int32->int8 bitcast LAYOUT discovery: r3a showed the bitcast
   multiplies the SUBLANE dim by 4 (shape (M, N) -> (4M, N)); learn the
   byte->sublane mapping empirically, then validate a packed int8 matmul
   built as 4 byte-plane dots (the route that would let packed-int8
   activations roll as 32-bit words — the only stated Mosaic blocker —
   while the dots run the measured-269-TFLOP/s int8 MXU path).
3. micro A/B: byte-plane int8 dot chain vs the round-2 kernel's
   bf16-dot-after-f32-roll form on a representative packed-conv tile, to
   decide whether a full int8 Pallas kernel rebuild could beat the XLA
   path (785 Mpx/s median in r3a).

Usage: timeout 3000 python tools/bench_probe_r3b.py
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


def probe_bitcast_layout():
    """Learn the int32->int8 bitcast byte->sublane mapping."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, N = 8, 128

    def kernel(x_ref, o_ref):
        o_ref[...] = pltpu.bitcast(x_ref[...], jnp.int8)

    x8 = np.arange(M * N * 4, dtype=np.int32).astype(np.int8) \
        .reshape(M, N, 4)                       # byte b of word (m, n)
    words = (x8[..., 0].astype(np.int32) & 0xFF) \
        | ((x8[..., 1].astype(np.int32) & 0xFF) << 8) \
        | ((x8[..., 2].astype(np.int32) & 0xFF) << 16) \
        | ((x8[..., 3].astype(np.int32) & 0xFF) << 24)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((4 * M, N), jnp.int8),
        )(jnp.asarray(words))
        out = np.asarray(out)
    except Exception as e:
        print(f"  bitcast (4M, N) failed: {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)
        return None
    # hypothesis space: out[?(m,b)] rows
    for name, rowmap in {
        "m*4+b": lambda m, b: 4 * m + b,
        "b*M+m": lambda m, b: b * M + m,
    }.items():
        ok = all(np.array_equal(out[rowmap(m, b)], x8[m, :, b])
                 for m in range(M) for b in range(4))
        print(f"  bitcast row layout {name}: {'MATCH' if ok else 'no'}",
              flush=True)
        if ok:
            return name
    print("  bitcast layout: UNRECOGNIZED; out[0,:8]=", out[0, :8],
          " x8[0,:2,:]=", x8[0, :2, :], flush=True)
    return "unknown"


def probe_byteplane_dot(layout):
    """Packed int8 matmul as 4 byte-plane dots — correctness + micro A/B
    vs the r2 form (f32 roll + bf16 dot) on a packed-conv-like tile."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K, N = 1024, 512, 128                    # K = 4*128 packed channels
    rng = np.random.default_rng(0)
    a8 = rng.integers(-127, 128, (M, K), dtype=np.int8)
    w8 = rng.integers(-127, 128, (K, N), dtype=np.int8)
    want = a8.astype(np.int32) @ w8.astype(np.int32)
    # pack: word (m, n) holds channels 4n..4n+3 -> byte b = channel 4n+b
    words = a8.reshape(M, K // 4, 4)
    packed = (words[..., 0].astype(np.int32) & 0xFF) \
        | ((words[..., 1].astype(np.int32) & 0xFF) << 8) \
        | ((words[..., 2].astype(np.int32) & 0xFF) << 16) \
        | ((words[..., 3].astype(np.int32) & 0xFF) << 24)

    # weight per byte plane b: rows (4n + b) -> (K/4, N)
    wb = np.stack([w8[b::4, :] for b in range(4)])          # byte-plane rows

    def kernel(x_ref, w_ref, o_ref):
        x32 = x_ref[...]                                    # (M, K/4) int32
        x32 = pltpu.roll(x32, 0, 0)                         # keep a roll in
        x8v = pltpu.bitcast(x32, jnp.int8)                  # (4M, K/4)
        acc = None
        for b in range(4):
            if layout == "m*4+b":
                plane = x8v.reshape(M, 4, K // 4)[:, b, :]
            else:                                           # b*M + m
                plane = x8v[b * M:(b + 1) * M, :]
            d = jax.lax.dot_general(
                plane, w_ref[b], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = d if acc is None else acc + d
        o_ref[...] = acc

    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        )(jnp.asarray(packed), jnp.asarray(wb))
        out = np.asarray(out)
        ok = np.array_equal(out, want)
        print(f"  byte-plane int8 dot: {'CORRECT' if ok else 'WRONG'} "
              f"(maxdiff {np.abs(out - want).max()})", flush=True)
        if not ok:
            return
    except Exception as e:
        print(f"  byte-plane int8 dot: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        return

    # micro throughput A/B (interleaved): chained K-diff over the two forms
    def run_int8(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        )(x, jnp.asarray(wb)).astype(jnp.float32)

    w_bf = jnp.asarray(w8.astype(np.float32), jnp.bfloat16)

    # baseline: XLA bf16 dot on the unpacked operand (the dot form the
    # XLA packed conv path effectively runs)
    a_f32 = jnp.asarray(a8.astype(np.float32))

    def xla_bf16(x):
        return jnp.dot(x.astype(jnp.bfloat16), w_bf,
                       preferred_element_type=jnp.float32)

    import statistics
    state = {}
    xw = jnp.asarray(packed)
    for rep in range(5):
        measure_mat(run_int8, xw, state, "mosaic_int8_byteplane")
        measure_mat(xla_bf16, a_f32, state, "xla_bf16_dot")
    for name, vals in state.items():
        flops = 2 * M * K * N
        med = statistics.median(vals)
        print(f"  {name}: median {med * 1e3:.3f} ms -> "
              f"{flops / med / 1e12:.1f} TFLOP/s (per-call s: "
              f"{[round(v, 5) for v in vals]})", flush=True)


def measure_mat(fn, x, state, name, k_long=64):
    """K-diff seconds-per-call for a matmul-like fn (nonlinear consumer)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def chained(K):
        @jax.jit
        def f(c):
            def body(i, c):
                y = fn(x)
                return c + 1e-20 * jnp.sum(y * y) + 0 * c
            return lax.fori_loop(0, K, body, c)
        return f

    # NOTE: fn ignores the carry -> insert data dependency via the consumer
    times = {}
    for K in (2, k_long):
        f = chained(K)
        y = f(jnp.float32(0.0))
        _ = float(y)
        t0 = time.perf_counter()
        y = f(jnp.float32(0.0))
        _ = float(y)
        times[K] = time.perf_counter() - t0
    per = (times[k_long] - times[2]) / (k_long - 2)
    state.setdefault(name, []).append(per)
    print(f"    {name}: {per * 1e6:.1f} us/call", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from sesr_tpu.config import spec_for_task
    from sesr_tpu.ops.packed import _packed_fast_impl
    from sesr_tpu.ops.slab import packed_slab_forward
    from sesr_tpu.quant.integer import _hashable
    from sesr_tpu.quant.params import QuantParams

    spec = spec_for_task("sr_x2")
    qp = QuantParams.load(os.path.join(REPO, "artifacts",
                                       "qparams_sr_x2.npz"))
    qph = _hashable(qp)

    t0 = time.time()
    print("warmup readback...", flush=True)
    y = jax.jit(lambda x: x * 2.0)(jnp.ones((8, 128)))
    _ = float(jnp.sum(y))
    print(f"done in {time.time() - t0:.0f}s", flush=True)

    rng = np.random.default_rng(0)
    x_hd = jax.device_put(jnp.asarray(
        rng.random((1, 1080, 1920, 3), dtype=np.float32)))
    x_b8 = jax.device_put(jnp.asarray(
        rng.random((8, 540, 960, 3), dtype=np.float32)))
    x_1 = jax.device_put(jnp.asarray(
        rng.random((1, 540, 960, 3), dtype=np.float32)))
    cands = {
        "b1_mono": (x_1, lambda c: _packed_fast_impl(spec, c, qph, (2, 4))),
        "hd_mono": (x_hd, lambda c: _packed_fast_impl(spec, c, qph, (2, 4))),
        "hd_slab_unroll": (x_hd, lambda c: packed_slab_forward(
            spec, qp, c, s=(2, 4), unroll=True)),
        "hd_slab_unroll_h360": (x_hd, lambda c: packed_slab_forward(
            spec, qp, c, s=(2, 4), slab_h=360, unroll=True)),
        "b8_batched": (x_b8, lambda c: _packed_fast_impl(spec, c, qph,
                                                         (2, 4))),
        "b8_serial_unroll": (x_b8, lambda c: packed_slab_forward(
            spec, qp, c, s=(2, 4), batch_serial=True, unroll=True)),
        "b1_int8out": (x_1, lambda c: _packed_fast_impl(
            spec, c, qph, (2, 4), True, None, "int8").astype(jnp.float32)),
    }
    state = {}
    print("interleaved slab/batch probes, 5 reps:", flush=True)
    for rep in range(5):
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

    # Mosaic probes LAST: a wedged remote Mosaic compile must not starve
    # the XLA measurements (it did in the first r3b attempt)
    print("bitcast layout discovery:", flush=True)
    layout = probe_bitcast_layout()
    if layout in ("m*4+b", "b*M+m"):
        print("byte-plane dot probe:", flush=True)
        probe_byteplane_dot(layout)


if __name__ == "__main__":
    main()
