"""Round-3 probe I: does the (1,8)-cell win (r3h: +59% at 1080p, tie at
540p) extend to the other deployment configurations?

  - 4K input (2160x3840 -> 8K out), f32 and int8 output contracts
  - batch 8 at 540p (the round-2 batching regression: 620 -> ~420)
  - the layer-hybrid lowering on nr (same 8-cell channel counts, so the
    OC-concat lane-fill tuning carries over unchanged)

Interleaved in one process, 4 reps, medians. Usage:
timeout 3600 python tools/bench_probe_r3i.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

K_SHORT, K_LONG = 2, 12
REPS = 4


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sesr_tpu.config import spec_for_task
    from sesr_tpu.ops.packed import _packed_fast_impl, _packed_exact_impl
    from sesr_tpu.quant.integer import _hashable
    from sesr_tpu.quant.params import QuantParams

    spec = spec_for_task("sr_x2")
    qp = _hashable(QuantParams.load(
        os.path.join(REPO, "artifacts", "qparams_sr_x2.npz")))
    spec_nr = spec_for_task("nr")
    qp_nr = _hashable(QuantParams.load(
        os.path.join(REPO, "artifacts", "qparams_nr.npz")))

    t0 = time.time()
    log("probe: eating first-readback stall...")
    y = jax.jit(lambda x: x * 2.0)(jnp.ones((8, 128)))
    _ = float(jnp.sum(y))
    log(f"probe: stall eaten in {time.time()-t0:.0f}s")

    rng = np.random.default_rng(0)
    x_4k = jax.device_put(jnp.asarray(
        rng.random((1, 2160, 3840, 3), dtype=np.float32)))
    x_b8 = jax.device_put(jnp.asarray(
        rng.random((8, 540, 960, 3), dtype=np.float32)))
    x_nr = jax.device_put(jnp.asarray(
        rng.random((1, 540, 960, 3), dtype=np.float32)))

    def fast(c, s, out="f32"):
        y = _packed_fast_impl(spec, c, qp, s, True, None, out, "packed")
        return y.astype(jnp.float32) if out == "int8" else y

    def hybrid(c, s):
        return _packed_exact_impl(spec_nr, c, qp_nr, s, True,
                                  tuple(qp_nr.fast_cert_layers))

    candidates = {
        "c18_4k": (x_4k, lambda c: fast(c, (1, 8))),
        "c24_4k": (x_4k, lambda c: fast(c, (2, 4))),
        "c18_4k_i8out": (x_4k, lambda c: fast(c, (1, 8), "int8")),
        "c18_b8_540": (x_b8, lambda c: fast(c, (1, 8))),
        "c24_b8_540": (x_b8, lambda c: fast(c, (2, 4))),
        "nr_hyb_c18": (x_nr, lambda c: hybrid(c, (1, 8))),
        "nr_hyb_c24": (x_nr, lambda c: hybrid(c, (2, 4))),
    }

    state = {}

    def measure(name, x, fn):
        def chained(K):
            @jax.jit
            def f(x):
                def body(i, c):
                    y = fn(c).astype(jnp.float32)
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
        px = x.shape[0] * x.shape[1] * x.shape[2]
        state.setdefault(name, []).append(px / per_it / 1e6)
        log(f"    {name}: {per_it*1e3:.3f} ms ({px/per_it/1e6:.0f} Mpx/s)")

    log(f"interleaved probes, {REPS} reps:")
    for rep in range(REPS):
        log(f"  rep {rep}:")
        for name, (xx, fn) in candidates.items():
            try:
                measure(name, xx, fn)
            except Exception as e:
                msg = str(e).splitlines()[0][:160] if str(e) else \
                    type(e).__name__
                state.setdefault(name, []).append(float("nan"))
                log(f"    {name}: FAILED {msg}")

    print(json.dumps({
        "medians_mpxs": {k: round(float(np.nanmedian(v)), 1)
                         for k, v in state.items()},
        "all_mpxs": {k: [round(x, 1) for x in v] for k, v in state.items()},
    }))


if __name__ == "__main__":
    main()
