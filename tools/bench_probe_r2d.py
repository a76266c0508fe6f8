"""TPU probe: where do the packed deployment path's non-conv milliseconds go?

bench_probe_r2c.py: a 5-conv 128-ch chained pipeline with the full quant
epilogue runs at ~153 TFLOP/s, but the real packed path (603 Mpx/s) runs at
~87 inflated TFLOP/s. This probe brackets the gap on the REAL layer shapes:

  full           the shipped _packed_fast_impl (baseline)
  ideal_chain    the same 5 convs (real channel counts 24/128/128/128/96,
                 real taps) with the full epilogue but none of the
                 boundary work (no s2d/d2s, no pad/mask, no residual, no
                 quantize-in/dequant-out, no PixelShuffle)

full - ideal_chain = total boundary cost. Measured round 2: full 0.882 ms,
ideal_chain 0.509 ms (42% boundary). The output-transform share was then
established by before/after bench.py runs of the fused int8
d2s+PixelShuffle transform (603 -> 626 Mpx/s, i.e. ~0.06 ms/frame; the
int8 entry transpose took the headline to 638).
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
    from sesr_tpu.ops.fixedpoint import apply_requant_f32, saturate
    from sesr_tpu.ops.packed import (_packed_fast_impl, pack_weight_hwio,
                                     packed_conv_same, packed_layer_taps,
                                     space_to_depth_nhwc)
    from sesr_tpu.quant.integer import _hashable
    from sesr_tpu.quant.params import QuantParams

    spec = spec_for_task(TASK)
    qp = _hashable(QuantParams.load(
        os.path.join(REPO, "artifacts", f"qparams_{TASK}.npz")))
    s = (2, 4)

    t0 = time.time()
    log("probe: eating first-readback stall...")
    y = jax.jit(lambda x: x * 2.0)(jnp.ones((8, 128)))
    _ = float(jnp.sum(y))
    log(f"probe: stall eaten in {time.time()-t0:.0f}s")

    rng = np.random.default_rng(0)
    x_img = jnp.asarray(rng.random((1, H, W, spec.in_channels),
                                   dtype=np.float32))

    # packed weights at real shapes
    L = spec.num_convs
    packed_w, taps = [], []
    for i in range(L):
        wp = pack_weight_hwio(np.asarray(qp.w_int[i], np.float32), s)
        packed_w.append(jnp.asarray(wp, jnp.bfloat16))
        taps.append(packed_layer_taps(spec, i, s))

    def ideal_chain(xp):
        h = xp
        for i in range(L):
            (qy_lo, qy_hi), (qx_lo, qx_hi) = taps[i]
            y = packed_conv_same(h.astype(jnp.bfloat16), packed_w[i],
                                 (qy_lo, qx_lo), (qy_hi, qx_hi)
                                 ).astype(jnp.int32)
            y = saturate(y, 20)
            f = apply_requant_f32(y, int(qp.requant_m[i]),
                                  int(qp.requant_n[i]))
            f = jax.nn.relu(f)
            q = jnp.clip(jnp.round(f), -128, 127)
            h = q.astype(jnp.int8).astype(jnp.float32)
            if h.shape[-1] != 128:           # keep the chain shape-stable
                h = jnp.pad(h, ((0, 0),) * 3 + ((0, 128 - h.shape[-1]),))
        return h

    xp0 = space_to_depth_nhwc(
        jnp.asarray(rng.integers(-128, 128, (1, H, W, spec.in_channels))
                    .astype(np.float32)), s)
    xp0 = jnp.pad(xp0, ((0, 0),) * 3 + ((0, 128 - xp0.shape[-1]),))

    def ideal_entry(xp):
        return ideal_chain(xp[..., :spec.in_channels * s[0] * s[1]])

    import sesr_tpu.ops.packed as P

    candidates = {
        "full": (x_img, lambda c: P._packed_fast_impl(spec, c, qp, s)),
        "ideal_chain": (xp0, ideal_entry),
    }

    px = H * W
    results = {}
    for name, (x, fn) in candidates.items():
        try:
            def chained(K, fn=fn):
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
            results[name] = round(per_it * 1e3, 3)
            log(f"probe: {name}: {per_it*1e3:.3f} ms/frame "
                f"({px/per_it/1e6:.0f} Mpx/s)")
        except Exception as e:
            msg = str(e).splitlines()[0][:160] if str(e) else type(e).__name__
            results[name] = f"ERROR: {msg}"
            log(f"probe: {name}: FAILED {msg}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
