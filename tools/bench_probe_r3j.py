"""Round-3 probe J: after (1,8) killed the entry share, the next block is
the layer-boundary cost (r3f at (2,4): 0.147 ms of the 0.85 ms frame).
Candidates, all (1,8) cells at 540p, interleaved:

  full18        the shipped _packed_fast_impl
  full18_nres   + int16 narrow store of the L-2 -> residual boundary:
                layer L-1 consumes round(h_{L-2}), which is idempotent
                under rounding, so storing round(relu(requant_{L-2})) as
                int16 is exact whenever |round(h)| < 2^15 (certifiable
                like the shortcut; static bound exists for 5/6 artifacts,
                sr_x2's is empirical-only at 53920)
  ideal18       conv core + epilogue only (r2d/r3f floor at these shapes)

Usage: timeout 3600 python tools/bench_probe_r3j.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

TASK = "sr_x2"
H, W = 540, 960
S = (1, 8)
K_SHORT, K_LONG = 2, 22
REPS = 5


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sesr_tpu.config import spec_for_task
    from sesr_tpu.ops.fixedpoint import apply_requant_f32, saturate
    from sesr_tpu.ops.packed import (_packed_fast_impl, pack_weight_hwio,
                                     packed_conv_same, packed_layer_taps,
                                     packed_to_image_nhwc)
    from sesr_tpu.quant.integer import _hashable
    from sesr_tpu.quant.params import QuantParams

    spec = spec_for_task(TASK)
    qp = _hashable(QuantParams.load(
        os.path.join(REPO, "artifacts", f"qparams_{TASK}.npz")))
    hw = qp.hw
    L = spec.num_convs
    sh, sw = S
    qmin, qmax = -128.0, 127.0
    bias_hi = (1 << (hw.bias_bits - 1)) - 1

    t0 = time.time()
    log("probe: eating first-readback stall...")
    y = jax.jit(lambda x: x * 2.0)(jnp.ones((8, 128)))
    _ = float(jnp.sum(y))
    log(f"probe: stall eaten in {time.time()-t0:.0f}s")

    rng = np.random.default_rng(0)
    x_img = jax.device_put(jnp.asarray(
        rng.random((1, H, W, spec.in_channels), dtype=np.float32)))

    packed_w, taps, fused_p = [], [], []
    for i in range(L):
        wp = pack_weight_hwio(np.asarray(qp.w_int[i], np.float32), S)
        packed_w.append(jnp.asarray(wp, jnp.bfloat16))
        taps.append(packed_layer_taps(spec, i, S))
        f = np.clip(np.asarray(qp.bias_int[i]), -bias_hi - 1, bias_hi)
        fused_p.append(jnp.asarray(np.tile(f, sh * sw), jnp.int32))

    r = spec.scaling_factor if spec.has_pixel_shuffle else 1

    def full_variant(x, nres: bool):
        # the shipped impl's body with the optional L-2 narrow store
        x_q = jnp.clip(jnp.round(x / jnp.float32(qp.a_scale[0])
                                 + jnp.float32(qp.a_zero[0])), qmin, qmax)
        n, hh, ww, c = x_q.shape
        h = x_q.astype(jnp.int8).reshape(n, hh, ww // sw, sw * c)
        shortcut = None
        for i in range(L):
            z_eff = float(qp.effective_zero(i))
            if i == 0:
                x_qi = h.astype(jnp.float32)
            elif i < L - 1:
                x_qi = jnp.clip(jnp.round(h + jnp.float32(qp.a_zero[i])),
                                qmin, qmax)
            else:
                t = jnp.round(shortcut) + jnp.round(h)
                t = apply_requant_f32(t, qp.res_requant_m, qp.res_requant_n)
                x_qi = jnp.clip(jnp.round(t + jnp.float32(qp.a_zero[i])),
                                qmin, qmax)
            if i > 0:
                x_qi = x_qi.astype(jnp.int8).astype(jnp.float32)
            x_shift = x_qi - jnp.float32(z_eff)
            (qy_lo, qy_hi), (qx_lo, qx_hi) = taps[i]
            y = packed_conv_same(x_shift.astype(jnp.bfloat16), packed_w[i],
                                 (qy_lo, qx_lo), (qy_hi, qx_hi)
                                 ).astype(jnp.int32)
            y = saturate(y, hw.pe_add_bits)
            y = y + fused_p[i]
            h = apply_requant_f32(y, qp.requant_m[i], qp.requant_n[i])
            if i == 0:
                h = jax.nn.relu(h)
                shortcut = jnp.round(h).astype(jnp.int16).astype(jnp.float32)
            elif i < L - 1:
                h = jax.nn.relu(h)
                if nres and i == L - 2:
                    # round is idempotent; layer L-1 consumes round(h)
                    h = jnp.round(h).astype(jnp.int16).astype(jnp.float32)
        out_q = jnp.clip(jnp.round(h + jnp.float32(qp.a_zero[L])),
                         qmin, qmax)
        img = packed_to_image_nhwc(out_q.astype(jnp.int8), S, r)
        return (img.astype(jnp.float32) - jnp.float32(qp.a_zero[L])) \
            * jnp.float32(qp.a_scale[L])

    def ideal18(xp):
        h = xp[..., :spec.in_channels * sh * sw]
        for i in range(L):
            (qy_lo, qy_hi), (qx_lo, qx_hi) = taps[i]
            y = packed_conv_same(h.astype(jnp.bfloat16), packed_w[i],
                                 (qy_lo, qx_lo), (qy_hi, qx_hi)
                                 ).astype(jnp.int32)
            y = saturate(y, hw.pe_add_bits)
            f = apply_requant_f32(y, int(qp.requant_m[i]),
                                  int(qp.requant_n[i]))
            f = jax.nn.relu(f)
            q = jnp.clip(jnp.round(f), -128, 127)
            h = q.astype(jnp.int8).astype(jnp.float32)
            if h.shape[-1] != 128:
                h = jnp.pad(h, ((0, 0),) * 3 + ((0, 128 - h.shape[-1]),))
        return h

    xp0 = jax.device_put(jnp.asarray(
        np.pad(rng.integers(-128, 128, (1, H, W // sw,
                                        sw * spec.in_channels))
               .astype(np.float32),
               ((0, 0),) * 3 + ((0, 128 - sw * spec.in_channels),)),
        jnp.float32))

    candidates = {
        "full18": (x_img,
                   lambda c: _packed_fast_impl(spec, c, qp, S)),
        "full18_nres": (x_img, lambda c: full_variant(c, True)),
        "full18_ctrl": (x_img, lambda c: full_variant(c, False)),
        "ideal18": (xp0, ideal18),
    }

    px = H * W
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
        state.setdefault(name, []).append(per_it * 1e3)
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

    med = {k: round(float(np.nanmedian(v)), 3) for k, v in state.items()}
    print(json.dumps({"medians_ms": med,
                      "medians_mpxs": {k: round(px / (m / 1e3) / 1e6, 1)
                                       for k, m in med.items()},
                      "all_ms": {k: [round(x, 3) for x in v]
                                 for k, v in state.items()}}))


if __name__ == "__main__":
    main()
