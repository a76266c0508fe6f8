"""Round-4 probe D — the per-tap-dot form of the fused Pallas packed
kernel (tap_dots=True: NO lane-concat im2col; one K=128 MXU-native dot
per tap, accumulated) vs the r4c concat forms, at (1,8), interleaved with
the XLA fast control. The concat is the documented relayout cost of the
kernel; if rolls alone are cheap, this form should close most of the gap
to XLA. Tap-dots also free the patch VMEM, admitting wider/taller tiles.

Usage: timeout 3600 python tools/bench_probe_r4d.py
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
    from sesr_tpu.ops.pallas_packed import build_pallas_packed_forward
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

    candidates = {
        "xla_f18": (lambda c: _packed_fast_impl(spec, c, qp, (1, 8))),
    }
    for name, (th, tw, dt, td) in {
        "pi_cat_t56x40": (56, 40, "int8", False),   # r4c best
        "pt8_t56x40": (56, 40, "int8", True),
        "ptb_t56x40": (56, 40, "bf16", True),
        "pt8_t56x64": (56, 64, "int8", True),
        "pt8_t104x40": (104, 40, "int8", True),
    }.items():
        candidates[name] = build_pallas_packed_forward(
            spec, qp.qp, 540, 960, s=(1, 8), tile_h=th, tile_w=tw,
            dot_dtype=dt, tap_dots=td)

    def make_runner(fn):
        fns = {}
        for K in (K_SHORT, K_LONG):
            @jax.jit
            def f(x, K=K):
                def body(i, c):
                    y = fn(c)
                    return c + 1e-12 * jnp.mean(y * y)
                return lax.fori_loop(0, K, body, x)
            fns[K] = f

        def run():
            times = {}
            for K in (K_SHORT, K_LONG):
                y = fns[K](x_1)
                _ = float(jnp.sum(y[:1, :2, 0, 0]))
                t0 = time.perf_counter()
                y = fns[K](x_1)
                _ = float(jnp.sum(y[:1, :2, 0, 0]))
                times[K] = time.perf_counter() - t0
            per = (times[K_LONG] - times[K_SHORT]) / (K_LONG - K_SHORT)
            return x_1.shape[0] * x_1.shape[1] * x_1.shape[2] / per / 1e6
        return run

    runners = {name: make_runner(fn) for name, fn in candidates.items()}
    results = {name: [] for name in candidates}
    dead = set()

    for rep in range(REPS):
        for name in candidates:
            if name in dead:
                continue
            try:
                t0 = time.time()
                v = runners[name]()
                results[name].append(v)
                log(f"rep {rep} {name}: {v:.1f} Mpx/s "
                    f"({time.time()-t0:.0f}s)")
            except Exception as e:
                log(f"rep {rep} {name}: FAILED {type(e).__name__}: "
                    f"{str(e)[:160]}")
                dead.add(name)

    import statistics
    summary = {name: {"median": round(statistics.median(vals), 1),
                      "reps": [round(v, 1) for v in vals]}
               for name, vals in results.items() if vals}
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
