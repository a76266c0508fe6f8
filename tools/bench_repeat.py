"""Interleaved repeated measurement of the headline candidates.

Single runs on this tunneled TPU swing up to ~5x between processes
(apparent chip sharing / frequency states); interleaving candidates
within one process and repeating attributes the variance correctly.
Prints every sample + medians (JSON to stdout).
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TASK = "sr_x2"
H, W = 540, 960
ROUNDS = 4


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from bench import measure
    from sesr_tpu.config import spec_for_task
    from sesr_tpu.quant.params import QuantParams
    from sesr_tpu.quant.integer import _hashable
    from sesr_tpu.ops.packed import _packed_fast_impl
    from sesr_tpu.ops.pallas_packed import build_pallas_packed_forward

    spec = spec_for_task(TASK)
    qp = _hashable(QuantParams.load(
        os.path.join(REPO, "artifacts", f"qparams_{TASK}.npz")))

    y = jax.jit(lambda x: x * 2.0)(jnp.ones((8, 128)))
    _ = float(jnp.sum(y))
    log("stall eaten")

    pallas_fwd = build_pallas_packed_forward(spec, qp.qp, H, W, s=(2, 4),
                                             tile_h=24, tile_w=64, g=8)
    cands = {
        "packed_2x4": lambda c: _packed_fast_impl(spec, c, qp, (2, 4)),
        "packed_4x4": lambda c: _packed_fast_impl(spec, c, qp, (4, 4)),
        "pallas_2x4": pallas_fwd,
    }

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.random((1, H, W, spec.in_channels), dtype=np.float32)))

    samples = {k: [] for k in cands}
    for r in range(ROUNDS):
        for name, fn in cands.items():
            m = measure(fn, x, spec)
            samples[name].append(round(m, 1))
            log(f"round {r}: {name}: {m:.1f} Mpx/s")

    out = {k: {"samples": v, "median": round(statistics.median(v), 1)}
           for k, v in samples.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
