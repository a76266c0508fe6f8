"""Benchmark: SESR-x2 INT8 inference throughput on one TPU chip.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"};
progress goes to stderr.

Measurement protocol (hard-won; see CLAUDE.md "Environment gotchas"):
- On this environment's tunneled TPU backend, jax.block_until_ready returns
  at SUBMISSION, not completion — naive timing loops measure dispatch rate
  and can report 100x the hardware's peak FLOPs. The only real sync is a
  device->host readback.
- The first readback in a process stalls for ~200-400 s (one-time relay
  warmup); this benchmark eats that stall up front, on a trivial op.
- Timing then uses a K-difference: the whole pipeline runs K times inside
  one jitted lax.fori_loop with a data dependency between iterations (so
  the loop cannot be elided or overlapped), synced by a scalar readback;
  per-frame time = (t[K=42] - t[K=2]) / 40, which cancels dispatch and
  readback overhead exactly. The instrument is validated by a 4096^2 bf16
  matmul measuring 156 TFLOP/s against the v5e's ~197 peak.
- Everything before timing is host-side numpy (artifacts/qparams_*.npz),
  because the post-readback "poisoned" dispatch mode (~3 ms/call) does not
  affect in-loop iterations.

Measured configuration: the deployment datapath (corrected zero-correction
handling + fast single-conv-per-layer bf16 MXU lowering; bit-identical to
the per-PE-exact path whenever the 18-bit saturation never fires, which
calibration certifies via the overflow counters).

vs_baseline: the reference's own bit-exact INT8 path (exe_mode=1 fx
pipeline, sim.py:81-114) on this host CPU with all export flags off — its
fastest configuration: 0.3135 Mpx/s (tools/bench_reference.py; as shipped,
with its always-on dump-to-disk, it is 0.0382 Mpx/s).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

REFERENCE_CPU_MPXS = 0.3135   # tools/bench_reference.py --task sr_x2 --no-dumps

TASK = "sr_x2"
H, W = 540, 960               # qHD input -> 1080p output at x2
K_SHORT, K_LONG = 2, 42


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _get_qparams():
    from sesr_tpu.quant.params import QuantParams

    path = os.path.join(REPO, "artifacts", f"qparams_{TASK}.npz")
    if not os.path.exists(path):
        subprocess.run([sys.executable, os.path.join(REPO, "tools", "make_qparams.py"),
                        "--tasks", TASK], check=True)
    return QuantParams.load(path)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sesr_tpu.config import spec_for_task
    from sesr_tpu.quant.integer import _integer_forward_impl, _hashable

    spec = spec_for_task(TASK)
    qp = _hashable(_get_qparams())            # pure host-side numpy

    t0 = time.time()
    log("bench: eating one-time first-readback stall (can take 200-400 s)...")
    y = jax.jit(lambda x: x * 2.0)(jnp.ones((8, 128)))
    _ = float(jnp.sum(y))
    log(f"bench: stall eaten in {time.time()-t0:.0f}s")

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(rng.random((1, H, W, spec.in_channels),
                                              dtype=np.float32)))

    def chained(K):
        @jax.jit
        def f(x):
            def body(i, c):
                y, _ = _integer_forward_impl(spec, c, qp, False, None,
                                             True, "fast")
                return c + 1e-12 * jnp.mean(y)
            return lax.fori_loop(0, K, body, x)
        return f

    times = {}
    for K in (K_SHORT, K_LONG):
        f = chained(K)
        y = f(x)
        _ = float(jnp.sum(y[:1, :2, 0, 0]))   # warm + sync
        t0 = time.perf_counter()
        y = f(x)
        _ = float(jnp.sum(y[:1, :2, 0, 0]))
        times[K] = time.perf_counter() - t0
        log(f"bench: K={K}: {times[K]*1e3:.1f} ms")

    per_frame = (times[K_LONG] - times[K_SHORT]) / (K_LONG - K_SHORT)
    mpxs = H * W / per_frame / 1e6
    out = {
        "metric": f"SESR-x2 INT8 inference (deployment datapath), {H}x{W} input, 1 chip",
        "value": round(mpxs, 1),
        "unit": "Mpixel/s",
        "vs_baseline": round(mpxs / REFERENCE_CPU_MPXS, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
