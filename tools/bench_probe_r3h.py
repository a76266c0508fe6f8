"""Round-3 probe H: (1,8) cells — W-only packing whose space_to_depth is a
pure reshape (no transpose: W and C are memory-adjacent in NHWC), same
128-lane fill and same 8x k=3 inflation as (2,4) — vs the shipped (2,4),
at 540p and 1080p; (2,4)+strided-entry as the r3g 1080p winner reference.
Interleaved, 5 reps, medians.

Usage: timeout 3600 python tools/bench_probe_r3h.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

K_SHORT, K_LONG = 2, 22
REPS = 5


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sesr_tpu.config import spec_for_task
    from sesr_tpu.ops.packed import _packed_fast_impl
    from sesr_tpu.quant.integer import _hashable
    from sesr_tpu.quant.params import QuantParams

    spec = spec_for_task("sr_x2")
    qp = _hashable(QuantParams.load(
        os.path.join(REPO, "artifacts", "qparams_sr_x2.npz")))

    t0 = time.time()
    log("probe: eating first-readback stall...")
    y = jax.jit(lambda x: x * 2.0)(jnp.ones((8, 128)))
    _ = float(jnp.sum(y))
    log(f"probe: stall eaten in {time.time()-t0:.0f}s")

    rng = np.random.default_rng(0)
    x_1 = jax.device_put(jnp.asarray(
        rng.random((1, 540, 960, 3), dtype=np.float32)))
    x_hd = jax.device_put(jnp.asarray(
        rng.random((1, 1080, 1920, 3), dtype=np.float32)))

    def fwd(c, s, entry):
        return _packed_fast_impl(spec, c, qp, s, True, None, "f32", entry)

    candidates = {
        "c24_540": (x_1, lambda c: fwd(c, (2, 4), "packed")),
        "c18_540": (x_1, lambda c: fwd(c, (1, 8), "packed")),
        "c18s_540": (x_1, lambda c: fwd(c, (1, 8), "strided")),
        "c24_1080": (x_hd, lambda c: fwd(c, (2, 4), "packed")),
        "c18_1080": (x_hd, lambda c: fwd(c, (1, 8), "packed")),
        "c24s_1080": (x_hd, lambda c: fwd(c, (2, 4), "strided")),
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
        px = x.shape[1] * x.shape[2]
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
