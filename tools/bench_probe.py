"""Ad-hoc TPU throughput probe for candidate deployment lowerings.

Same honest K-difference protocol as bench.py (readback-synced chained
fori_loop); prints one line per candidate to stderr and a JSON dict to
stdout. Used to pick the shipped deployment path; not the official bench.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TASK = "sr_x2"
H, W = 540, 960
K_SHORT, K_LONG = 2, 22


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sesr_tpu.config import spec_for_task
    from sesr_tpu.quant.integer import _integer_forward_impl, _hashable
    from sesr_tpu.quant.params import QuantParams
    from sesr_tpu.ops.packed import _packed_fast_impl

    spec = spec_for_task(TASK)
    qp = _hashable(QuantParams.load(
        os.path.join(REPO, "artifacts", f"qparams_{TASK}.npz")))

    t0 = time.time()
    log("probe: eating first-readback stall...")
    y = jax.jit(lambda x: x * 2.0)(jnp.ones((8, 128)))
    _ = float(jnp.sum(y))
    log(f"probe: stall eaten in {time.time()-t0:.0f}s")

    rng = np.random.default_rng(0)

    def make_input(batch):
        return jax.device_put(jnp.asarray(
            rng.random((batch, H, W, spec.in_channels), dtype=np.float32)))

    candidates = {
        "packed_2x2_b1": (1, lambda c: _packed_fast_impl(spec, c, qp, (2, 2))),
        "packed_2x4_b1": (1, lambda c: _packed_fast_impl(spec, c, qp, (2, 4))),
        "packed_2x2_f32_b1": (1, lambda c: _packed_fast_impl(spec, c, qp,
                                                             (2, 2), False)),
        "packed_2x2_b4": (4, lambda c: _packed_fast_impl(spec, c, qp, (2, 2))),
    }

    results = {}
    for name, (batch, fn) in candidates.items():
        x = make_input(batch)

        def chained(K):
            @jax.jit
            def f(x):
                def body(i, c):
                    y = fn(c)
                    return c + 1e-12 * jnp.mean(y)
                return lax.fori_loop(0, K, body, x)
            return f

        try:
            times = {}
            for K in (K_SHORT, K_LONG):
                f = chained(K)
                y = f(x)
                _ = float(jnp.sum(y[:1, :2, 0, 0]))
                t0 = time.perf_counter()
                y = f(x)
                _ = float(jnp.sum(y[:1, :2, 0, 0]))
                times[K] = time.perf_counter() - t0
            per_frame = (times[K_LONG] - times[K_SHORT]) / (K_LONG - K_SHORT)
            mpxs = batch * H * W / per_frame / 1e6
            results[name] = round(mpxs, 1)
            log(f"probe: {name}: {mpxs:.1f} Mpx/s ({per_frame*1e3:.2f} ms)")
        except Exception as e:
            results[name] = f"ERROR: {e}"
            log(f"probe: {name}: FAILED {e}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
