"""Round-4 probe B — the saturating tasks' serving configs, ONE process,
interleaved: did the round-4 narrow boundary stores (int8 inter-layer +
proven int16 shortcut, now enabled in the hybrid/PE-exact lowerings) close
the verdict-4 gap (nr hybrid 573 -> target >= 650), and does (1,8) remain
the right hybrid geometry with them on?  Also the pe-exact narrow-store
opt-in (sound for every shipped artifact via shortcut_static) and the
pe-exact (1,8)/(2,4) A/B on a 3-channel task (complement to r4a's sr_x2).

Candidates (540p, batch 1):
  nr    hybrid (1,8) narrow | hybrid (1,8) wide | hybrid (2,4) narrow
        pe-exact (1,8) narrow | pe-exact (1,8) wide | pe-exact (2,4) wide
  nrdm6 hybrid (1,8) narrow | hybrid (1,8) wide

Protocol per CLAUDE.md: one process, round-robin interleaved, REPS reps,
medians; K-difference timing, full-tensor nonlinear consumer; compiles
hoisted out of the rep loop.

Usage: timeout 3600 python tools/bench_probe_r4b.py
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
    from sesr_tpu.ops.packed import _packed_exact_impl
    from sesr_tpu.quant.integer import _hashable
    from sesr_tpu.quant.params import QuantParams

    specs, qps = {}, {}
    for task in ("nr", "nrdm_6"):
        specs[task] = spec_for_task(task)
        qps[task] = _hashable(QuantParams.load(
            os.path.join(REPO, "artifacts", f"qparams_{task}.npz")))
        assert qps[task].qp.fast_cert_layers is not None
        assert qps[task].qp.shortcut_static

    t0 = time.time()
    log("probe: eating first-readback stall...")
    y = jax.jit(lambda x: x * 2.0)(jnp.ones((8, 128)))
    _ = float(jnp.sum(y))
    log(f"probe: stall eaten in {time.time()-t0:.0f}s")

    rng = np.random.default_rng(0)
    x_1 = jax.device_put(jnp.asarray(
        rng.random((1, 540, 960, 3), dtype=np.float32)))

    def hyb(task, s, narrow):
        spec, qp = specs[task], qps[task]
        fl = tuple(qp.qp.fast_cert_layers)
        return lambda c: _packed_exact_impl(spec, c, qp, s, True, fl,
                                            None, "f32", narrow)

    def pe(task, s, narrow):
        spec, qp = specs[task], qps[task]
        return lambda c: _packed_exact_impl(spec, c, qp, s, True, None,
                                            None, "f32", narrow)

    candidates = {
        "nr_hyb18_narrow": hyb("nr", (1, 8), True),
        "nr_hyb18_wide": hyb("nr", (1, 8), False),
        "nr_hyb24_narrow": hyb("nr", (2, 4), True),
        "nr_pe18_narrow": pe("nr", (1, 8), True),
        "nr_pe18_wide": pe("nr", (1, 8), False),
        "nr_pe24_wide": pe("nr", (2, 4), False),
        "nrdm6_hyb18_narrow": hyb("nrdm_6", (1, 8), True),
        "nrdm6_hyb18_wide": hyb("nrdm_6", (1, 8), False),
    }

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

    for rep in range(REPS):
        for name in candidates:
            t0 = time.time()
            v = runners[name]()
            results[name].append(v)
            log(f"rep {rep} {name}: {v:.1f} Mpx/s ({time.time()-t0:.0f}s)")

    import statistics
    summary = {name: {"median": round(statistics.median(vals), 1),
                      "reps": [round(v, 1) for v in vals]}
               for name, vals in results.items()}
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
