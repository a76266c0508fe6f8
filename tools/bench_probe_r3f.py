"""Round-3 probe F: decompose the packed path's REMAINING boundary cost.

r2d established: full 0.882 ms vs ideal_chain (same real-shape convs +
epilogue, no boundary work) 0.509 ms — 42% boundary; the two shipped
fusions (fused d2s∘PixelShuffle output transform, int8 entry transpose)
reclaimed ~0.07 ms. ~0.3 ms/frame of boundary cost remains unattributed —
37% of the frame, the single largest non-conv block. This probe brackets
it with intermediate programs, interleaved in one process (chip drifts
15-40% across runs — CLAUDE.md protocol):

  full            _packed_fast_impl, f32 output (the shipped headline)
  full_i8out      out_dtype="int8" (skips the final dequant + f32 write)
  noentry         the IDENTICAL layer loop, but fed the pre-packed int8
                  (1, H/2, W/4, 24) tensor: no quantize-in, no pad, no
                  space_to_depth entry transpose
  noentry_noexit  same, returning the packed int8 out_q: additionally no
                  unpack transform, no dequant, no full-res write
  ideal_chain     r2d's floor: real-shape convs + full quant epilogue,
                  none of the residual wiring / zero shifts / exact
                  boundary rounding

  entry share         = full − noentry
  exit share          = noentry − noentry_noexit
  per-layer boundary  = noentry_noexit − ideal_chain

Usage: timeout 3600 python tools/bench_probe_r3f.py
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
S = (2, 4)
K_SHORT, K_LONG = 2, 22
REPS = 5


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import functools

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

    # the _packed_fast_impl layer loop VERBATIM (narrow_store semantics),
    # entry transform removed: h0 is the already-packed int8 tensor
    def layer_loop(h0):
        shortcut, h = None, None
        for i in range(L):
            z_eff = float(qp.effective_zero(i))
            if i == 0:
                x_qi = h0.astype(jnp.float32)
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
        zero_L, scale_L = qp.a_zero[L], qp.a_scale[L]
        return jnp.clip(jnp.round(h + jnp.float32(zero_L)), qmin, qmax)

    r = spec.scaling_factor if spec.has_pixel_shuffle else 1

    def noentry(h0):
        out_q = layer_loop(h0)
        img = packed_to_image_nhwc(out_q.astype(jnp.int8), S, r)
        return (img.astype(jnp.float32) - jnp.float32(qp.a_zero[L])) \
            * jnp.float32(qp.a_scale[L])

    def noentry_noexit(h0):
        return layer_loop(h0).astype(jnp.int8)

    # r2d's ideal floor: convs + epilogue only
    def ideal_chain(xp):
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

    # preparation strictly host-side (numpy) — CLAUDE.md: any readback has
    # switched this process to ~3 ms/dispatch sync mode
    x_np = rng.random((1, H, W, spec.in_channels)).astype(np.float32)
    x_q8 = np.clip(np.round(x_np / np.float32(qp.a_scale[0])
                            + np.float32(qp.a_zero[0])), -128, 127)
    n_, hh, ww, c_ = x_q8.shape
    h0_np = (x_q8.reshape(n_, hh // sh, sh, ww // sw, sw, c_)
             .transpose(0, 1, 3, 2, 4, 5)
             .reshape(n_, hh // sh, ww // sw, sh * sw * c_))
    h0 = jax.device_put(jnp.asarray(h0_np, jnp.int8))
    xp0 = jax.device_put(jnp.asarray(
        np.pad(h0_np, ((0, 0),) * 3 + ((0, 128 - h0_np.shape[-1]),)),
        jnp.float32))

    candidates = {
        "full": (x_img,
                 lambda c: _packed_fast_impl(spec, c, qp, S)),
        "full_i8out": (x_img,
                       lambda c: _packed_fast_impl(spec, c, qp, S, True,
                                                   None, "int8")),
        "noentry": (h0, noentry),
        "noentry_noexit": (h0, noentry_noexit),
        "ideal_chain": (xp0, ideal_chain),
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
    shares = {}
    if all(k in med for k in ("full", "noentry", "noentry_noexit",
                              "ideal_chain")):
        shares = {
            "entry_ms": round(med["full"] - med["noentry"], 3),
            "exit_ms": round(med["noentry"] - med["noentry_noexit"], 3),
            "layer_boundary_ms": round(med["noentry_noexit"]
                                       - med["ideal_chain"], 3),
            "conv_core_ms": med["ideal_chain"],
        }
    print(json.dumps({"medians_ms": med, "all_ms":
                      {k: [round(x, 3) for x in v]
                       for k, v in state.items()},
                      "shares": shares}))


if __name__ == "__main__":
    main()
