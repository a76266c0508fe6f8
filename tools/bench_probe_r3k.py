"""Round-3 probe K: confirm the (1,8) pure-reshape space_to_depth/
depth_to_space shortcut (r3j found XLA does NOT elide the singleton
transpose: probe-local reshape ran 0.742 ms vs the shipped 0.858 at 540p).
Shipped-after vs the old transpose form, interleaved.

Usage: timeout 3600 python tools/bench_probe_r3k.py
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

    import sesr_tpu.ops.packed as P
    from sesr_tpu.config import spec_for_task
    from sesr_tpu.quant.integer import _hashable
    from sesr_tpu.quant.params import QuantParams

    spec = spec_for_task("sr_x2")
    qp = _hashable(QuantParams.load(
        os.path.join(REPO, "artifacts", "qparams_sr_x2.npz")))

    # the OLD general forms (what shipped before the reshape shortcut)
    def s2d_old(x, s):
        sh, sw = P._s2(s)
        n, h, w, c = x.shape
        x = x.reshape(n, h // sh, sh, w // sw, sw, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(n, h // sh, w // sw, sh * sw * c)

    def p2i_old(x, s, r=1):
        sh, sw = P._s2(s)
        n, hs, ws, cp = x.shape
        c = cp // (sh * sw * r * r)
        x = x.reshape(n, hs, ws, sh, sw, c, r, r)
        x = x.transpose(0, 1, 3, 6, 2, 4, 7, 5)
        return x.reshape(n, hs * sh * r, ws * sw * r, c)

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
    x_b8 = jax.device_put(jnp.asarray(
        rng.random((8, 540, 960, 3), dtype=np.float32)))

    def with_old(c):
        orig_s2d, orig_p2i = P.space_to_depth_nhwc, P.packed_to_image_nhwc
        P.space_to_depth_nhwc, P.packed_to_image_nhwc = s2d_old, p2i_old
        try:
            return P._packed_fast_impl.__wrapped__(spec, c, qp, (1, 8),
                                                   True, None, "f32",
                                                   "packed")
        finally:
            P.space_to_depth_nhwc, P.packed_to_image_nhwc = \
                orig_s2d, orig_p2i

    candidates = {
        "new_540": (x_1, lambda c: P._packed_fast_impl(spec, c, qp, (1, 8))),
        "old_540": (x_1, with_old),
        "new_1080": (x_hd, lambda c: P._packed_fast_impl(spec, c, qp,
                                                         (1, 8))),
        "old_1080": (x_hd, with_old),
        "new_b8": (x_b8, lambda c: P._packed_fast_impl(spec, c, qp,
                                                       (1, 8))),
        "old_b8": (x_b8, with_old),
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
