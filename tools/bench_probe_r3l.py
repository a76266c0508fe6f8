"""Round-3 probe L: settle (1,8) vs (2,4) for the LAYER-HYBRID lowering
(the saturating tasks nr / nrdm_6). r3i's medians favored (1,8) on nr
(899 vs 657) but with 5x rep swings at K_LONG=12; this run uses the full
K_LONG=22 K-difference and 5 reps, interleaved, both tasks.

Usage: timeout 3600 python tools/bench_probe_r3l.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

H, W = 540, 960
K_SHORT, K_LONG = 2, 22
REPS = 5


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sesr_tpu.config import spec_for_task
    from sesr_tpu.ops.packed import _packed_exact_impl
    from sesr_tpu.quant.integer import _hashable
    from sesr_tpu.quant.params import QuantParams

    tasks = {}
    for t in ("nr", "nrdm_6"):
        sp = spec_for_task(t)
        qp = _hashable(QuantParams.load(
            os.path.join(REPO, "artifacts", f"qparams_{t}.npz")))
        tasks[t] = (sp, qp)

    t0 = time.time()
    log("probe: eating first-readback stall...")
    y = jax.jit(lambda x: x * 2.0)(jnp.ones((8, 128)))
    _ = float(jnp.sum(y))
    log(f"probe: stall eaten in {time.time()-t0:.0f}s")

    rng = np.random.default_rng(0)
    x_nr = jax.device_put(jnp.asarray(
        rng.random((1, H, W, 3), dtype=np.float32)))

    def hyb(t, s):
        sp, qp = tasks[t]
        fl = tuple(qp.fast_cert_layers)
        return lambda c: _packed_exact_impl(sp, c, qp, s, True, fl)

    candidates = {
        "nr_hyb_18": (x_nr, hyb("nr", (1, 8))),
        "nr_hyb_24": (x_nr, hyb("nr", (2, 4))),
        "nrdm6_hyb_18": (x_nr, hyb("nrdm_6", (1, 8))),
        "nrdm6_hyb_24": (x_nr, hyb("nrdm_6", (2, 4))),
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
