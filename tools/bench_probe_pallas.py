"""TPU throughput probe for the fused packed Pallas kernel (tile sweep).

Same K-difference protocol as bench.py. One line per config to stderr,
JSON dict to stdout.
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
    from sesr_tpu.quant.params import QuantParams
    from sesr_tpu.ops.pallas_packed import build_pallas_packed_forward

    spec = spec_for_task(TASK)
    qp = QuantParams.load(
        os.path.join(REPO, "artifacts", f"qparams_{TASK}.npz"))

    t0 = time.time()
    log("probe: eating first-readback stall...")
    y = jax.jit(lambda x: x * 2.0)(jnp.ones((8, 128)))
    _ = float(jnp.sum(y))
    log(f"probe: stall eaten in {time.time()-t0:.0f}s")

    rng = np.random.default_rng(0)

    configs = [
        ("s2x4_t24x80_g8", dict(s=(2, 4), tile_h=24, tile_w=80, g=8)),
        ("s2x4_t48x48_g8", dict(s=(2, 4), tile_h=48, tile_w=48, g=8)),
        ("s2x4_t40x48_g8", dict(s=(2, 4), tile_h=40, tile_w=48, g=8)),
        ("s2x4_t40x64_g8", dict(s=(2, 4), tile_h=40, tile_w=64, g=8)),
        ("s2x4_t32x64_b4", dict(s=(2, 4), tile_h=32, tile_w=64, g=8,
                                batch=4)),
    ]

    results = {}
    for name, kw in configs:
        x = jax.device_put(jnp.asarray(
            rng.random((1, H, W, spec.in_channels), dtype=np.float32)))
        try:
            fwd_b = build_pallas_packed_forward(spec, qp, H, W, **kw)

            def chained(K):
                @jax.jit
                def f(x):
                    def body(i, c):
                        y = fwd_b(c)
                        # full-tensor reduction, same consumer as bench.py:
                        # a strided SLICE here forces a pathological output
                        # relayout and under-reports by ~5x (round-2 bisect)
                        return c + 1e-12 * jnp.mean(y)
                    return lax.fori_loop(0, K, body, x)
                return f

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
            mpxs = H * W / per_frame / 1e6
            results[name] = round(mpxs, 1)
            log(f"probe: {name}: {mpxs:.1f} Mpx/s ({per_frame*1e3:.2f} ms)")
        except Exception as e:
            results[name] = f"ERROR: {type(e).__name__}: {str(e)[:200]}"
            log(f"probe: {name}: FAILED {type(e).__name__}: {str(e)[:300]}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
