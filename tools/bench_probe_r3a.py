"""Round-3 probe A: cut the packed datapath's dense-kernel FLOP inflation
by exploiting its block sparsity (VERDICT r2 next-round #1).

The packed conv kernel Kp (ops/packed.py pack_weight_hwio) is block-sparse:
for tap (qy, qx), the (dy, dx) -> (ey, ex) cell-offset block is nonzero only
where u = s_h*qy + dy - ey + r in [0, k) (and likewise for W). At k=3 and
s=(2, 4) only 72 of 576 blocks are nonzero (the 8x inflation). Partitioning
the taps into GROUPS whose union block-rectangle is small replaces the one
dense conv with a few narrow convs on contiguous channel slices:

  - "dense": one group, all taps (the shipped lowering, baseline A)
  - "h":     {qy=-1}, {qy=0}, {qy=+1} — the edge groups touch only the
             dy=1 -> ey=0 (resp. dy=0 -> ey=1) halves: (1, 3, 64, 64)
             convs; theoretical MXU-time 1.5x less than dense
  - "tap":   9 singleton taps, each at its minimal rectangle (center
             128x128, H-edges 64x64, W-edges 32x32, corners 16x16);
             theoretical MXU-time ~3.3x less, but 9 convs per layer
             (the round-2 "9 shifted dots" dead end cost 36% on EQUAL
             FLOPs — this variant must overcome that with a 3.3x cut)
  - "w":     {qx=-1}, {qx=0}, {qx=+1}

All variants are value-exact (f32 partial sums of the same integer terms).
Also probed in the same process: in-chip slab tiling at 1080p
(ops/slab.py), batch_serial at batch 8, and the Mosaic int8-bitcast
feasibility micro-kernel (the round-2 open door: rolls are 32-bit-only but
four int8 per int32 lane would keep rolls legal while the dots run the
measured-269-TFLOP/s int8 MXU path).

Protocol: CLAUDE.md rules — one process, interleaved reps, medians;
readback-synced K-difference; nonlinear full-tensor consumers.

Usage (real TPU):  timeout 3000 python tools/bench_probe_r3a.py
       (CPU correctness only):  python tools/bench_probe_r3a.py --check
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


# --------------------------------------------------------------------------
# tap-partition lowering


def _valid_pairs(k: int, s: int, q: int):
    """[(d, e)] cell-offset pairs valid for tap q along one axis."""
    r = k // 2
    return [(d, e) for d in range(s) for e in range(s)
            if 0 <= s * q + d - e + r < k]


def partition_groups(mode: str, k: int, sh: int, sw: int):
    """List of tap groups [(qy, qx), ...] for the partition mode."""
    from sesr_tpu.ops.packed import packed_tap_range
    qy_lo, qy_hi = packed_tap_range(k, sh)
    qx_lo, qx_hi = packed_tap_range(k, sw)
    taps = [(qy, qx) for qy in range(qy_lo, qy_hi + 1)
            for qx in range(qx_lo, qx_hi + 1)]
    if mode == "dense":
        return [taps]
    if mode == "tap":
        return [[t] for t in taps]
    if mode == "h":
        return [[t for t in taps if t[0] == qy]
                for qy in range(qy_lo, qy_hi + 1)]
    if mode == "w":
        return [[t for t in taps if t[1] == qx]
                for qx in range(qx_lo, qx_hi + 1)]
    raise ValueError(mode)


def group_plan(k: int, sh: int, sw: int, c_in: int, c_out: int, group):
    """Static plan for one tap group: (qy0, qx0, ty, tx, ic_blocks,
    oc_blocks) where blocks index the (dy*sw+dx) packed-channel blocks."""
    ic_blocks, oc_blocks = set(), set()
    for (qy, qx) in group:
        py = _valid_pairs(k, sh, qy)
        px = _valid_pairs(k, sw, qx)
        for dy, ey in py:
            for dx, ex in px:
                ic_blocks.add(dy * sw + dx)
                oc_blocks.add(ey * sw + ex)
    qys = [q for q, _ in group]
    qxs = [q for _, q in group]
    return (min(qys), min(qxs), max(qys) - min(qys) + 1,
            max(qxs) - min(qxs) + 1, sorted(ic_blocks), sorted(oc_blocks))


def _runs(blocks):
    """Contiguous runs [(start, stop)] of a sorted block list."""
    runs = []
    for b in blocks:
        if runs and runs[-1][1] == b:
            runs[-1][1] = b + 1
        else:
            runs.append([b, b + 1])
    return [(a, b) for a, b in runs]


def split_layer_consts(w_int_hwio, sh, sw, mode):
    """Host-side: per-group (plan, packed sub-kernel bf16)."""
    import jax.numpy as jnp
    from sesr_tpu.ops.packed import pack_weight_hwio

    k = w_int_hwio.shape[0]
    c_in, c_out = w_int_hwio.shape[2], w_int_hwio.shape[3]
    wp = pack_weight_hwio(np.asarray(w_int_hwio, np.float32), (sh, sw))
    from sesr_tpu.ops.packed import packed_tap_range
    qy_lo, _ = packed_tap_range(k, sh)
    qx_lo, _ = packed_tap_range(k, sw)
    consts = []
    for group in partition_groups(mode, k, sh, sw):
        plan = group_plan(k, sh, sw, c_in, c_out, group)
        g_qy0, g_qx0, ty, tx, icb, ocb = plan
        sub = np.zeros((ty, tx, len(icb) * c_in, len(ocb) * c_out),
                       np.float32)
        for (qy, qx) in group:
            full = wp[qy - qy_lo, qx - qx_lo]          # (Cp_in, Cp_out)
            for i_new, ib in enumerate(icb):
                for o_new, ob in enumerate(ocb):
                    sub[qy - g_qy0, qx - g_qx0,
                        i_new * c_in:(i_new + 1) * c_in,
                        o_new * c_out:(o_new + 1) * c_out] = \
                        full[ib * c_in:(ib + 1) * c_in,
                             ob * c_out:(ob + 1) * c_out]
        consts.append((plan, jnp.asarray(sub, jnp.bfloat16)))
    return consts


def split_conv(x_c, consts, c_in, c_out, n_blocks_out):
    """Grouped packed conv: sum of narrow convs on channel slices, each
    scattered back to the full OC width by zero-channel pads."""
    import jax
    import jax.numpy as jnp

    full_oc = n_blocks_out * c_out
    total = None
    for (qy0, qx0, ty, tx, icb, ocb), sub in consts:
        # input: concat of the contiguous channel runs
        runs = _runs(icb)
        if len(runs) == 1 and runs[0] == (0, len(icb)) and \
                len(icb) * c_in == x_c.shape[-1]:
            xin = x_c
        else:
            xin = jnp.concatenate(
                [x_c[..., a * c_in:b * c_in] for a, b in runs], axis=-1)
        # NONNEGATIVE padding + output slice. Negative lo-padding in
        # lax.conv_general_dilated produces garbage at the trimmed edges in
        # some configs (reproduced: (1,1,16,16) kernel, both axes (-1,1),
        # CPU backend) — avoid it entirely: pad (max(0,-q0), max(0,q0+t-1))
        # and slice the output window starting at max(q0, 0).
        ay, by = max(0, -qy0), max(0, qy0 + ty - 1)
        ax, bx = max(0, -qx0), max(0, qx0 + tx - 1)
        y = jax.lax.conv_general_dilated(
            xin, sub, window_strides=(1, 1),
            padding=[(ay, by), (ax, bx)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        oy, ox = max(qy0, 0), max(qx0, 0)
        H, W = x_c.shape[1], x_c.shape[2]
        y = y[:, oy:oy + H, ox:ox + W, :]
        # scatter compact OC back to full width (zero-channel pads)
        if len(ocb) * c_out == full_oc:
            lifted = y
        else:
            pieces = []
            for a, b in _runs(ocb):
                j0 = ocb.index(a)
                seg = y[..., j0 * c_out:(j0 + b - a) * c_out]
                pieces.append(jnp.pad(
                    seg, ((0, 0), (0, 0), (0, 0),
                          (a * c_out, full_oc - b * c_out))))
            lifted = pieces[0]
            for p in pieces[1:]:
                lifted = lifted + p
        total = lifted if total is None else total + lifted
    return total


def build_split_forward(spec, qp, s, mode):
    """_packed_fast_impl with the grouped conv lowering (probe-local copy:
    entry quant, int8 narrow stores, corrected residual, fused output
    transform all identical to ops/packed.py)."""
    import jax
    import jax.numpy as jnp
    from sesr_tpu.ops.fixedpoint import apply_requant_f32, saturate
    from sesr_tpu.ops.packed import (_s2, packed_to_image_nhwc,
                                     space_to_depth_nhwc)

    sh, sw = _s2(s)
    hw = qp.hw
    L = spec.num_convs
    bits = hw.quan_bits
    qmin, qmax = float(-(1 << (bits - 1))), float((1 << (bits - 1)) - 1)
    bias_hi = (1 << (hw.bias_bits - 1)) - 1
    cells = sh * sw

    layer_consts = []
    for i in range(L):
        m = mode if spec.kernel_sizes[i] == 3 else "dense"
        layer_consts.append(
            (split_layer_consts(np.asarray(qp.w_int[i]), sh, sw, m),
             spec.kernel_sizes[i]))

    @jax.jit
    def fwd(x):
        n, H, W, c_in0 = x.shape
        assert H % sh == 0 and W % sw == 0
        x_q = jnp.clip(jnp.round(x / jnp.float32(qp.a_scale[0])
                                 + jnp.float32(qp.a_zero[0])), qmin, qmax)
        h = space_to_depth_nhwc(x_q.astype(jnp.int8), (sh, sw))
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
            consts, _k = layer_consts[i]
            oc = np.asarray(qp.w_int[i]).shape[3]
            y = split_conv(x_shift.astype(jnp.bfloat16), consts,
                           np.asarray(qp.w_int[i]).shape[2], oc,
                           cells).astype(jnp.int32)
            y = saturate(y, hw.pe_add_bits)
            fused = np.clip(np.asarray(qp.bias_int[i]), -bias_hi - 1,
                            bias_hi)
            y = y + jnp.asarray(np.tile(fused, cells), jnp.int32)
            h = apply_requant_f32(y, qp.requant_m[i], qp.requant_n[i])
            if i == 0:
                h = jax.nn.relu(h)
                shortcut = jnp.round(h)
                shortcut = shortcut.astype(jnp.int16).astype(jnp.float32)
            elif i < L - 1:
                h = jax.nn.relu(h)
        zero_L, scale_L = qp.a_zero[L], qp.a_scale[L]
        out_q = jnp.clip(jnp.round(h + jnp.float32(zero_L)), qmin, qmax)
        r = spec.scaling_factor if spec.has_pixel_shuffle else 1
        img = packed_to_image_nhwc(out_q.astype(jnp.int8), (sh, sw), r)
        return (img.astype(jnp.float32) - jnp.float32(zero_L)) \
            * jnp.float32(scale_L)

    return fwd


# --------------------------------------------------------------------------
# probes


def check_correctness():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from sesr_tpu.config import spec_for_task
    from sesr_tpu.ops.packed import packed_fast_forward
    from sesr_tpu.quant.params import QuantParams

    spec = spec_for_task("sr_x2")
    qp = QuantParams.load(os.path.join(REPO, "artifacts",
                                       "qparams_sr_x2.npz"))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 24, 48, 3), dtype=np.float32))
    ref = np.asarray(packed_fast_forward(spec, qp, x, s=(2, 4)))
    for mode in ("dense", "h", "w", "tap"):
        got = np.asarray(build_split_forward(spec, qp, (2, 4), mode)(x))
        ok = np.array_equal(ref, got)
        print(f"  split mode {mode:5}: "
              f"{'bit-exact' if ok else 'MISMATCH ' + str(np.abs(ref - got).max())}")
        assert ok, mode
    print("correctness: all split modes bit-exact vs packed_fast_forward")


def measure(fn, x, reps_state, name):
    """K-difference Mpx/s (input pixels) — bench.py protocol."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    K_SHORT, K_LONG = 2, 22

    def chained(K):
        @jax.jit
        def f(x):
            def body(i, c):
                y = fn(c)
                return c + 1e-12 * jnp.mean(y * y)
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
    per = (times[K_LONG] - times[K_SHORT]) / (K_LONG - K_SHORT)
    mpxs = x.shape[0] * x.shape[1] * x.shape[2] / per / 1e6
    reps_state.setdefault(name, []).append(mpxs)
    print(f"    {name}: {mpxs:.1f} Mpx/s", flush=True)
    return mpxs


def probe_mosaic_int8_bitcast():
    """Can Mosaic bitcast int32 lanes to int8 (the packed-roll door)?"""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, w_ref, o_ref):
        x32 = x_ref[...]
        x32 = pltpu.roll(x32, 1, 1)               # 32-bit roll: legal
        x8 = pltpu.bitcast(x32, jnp.int8)         # the door under test
        o_ref[...] = jax.lax.dot_general(
            x8, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    M, Kd, N = 256, 512, 256
    x8 = np.arange(M * Kd, dtype=np.int8).reshape(M, Kd)
    x32 = x8.view(np.int32)
    w = np.ones((Kd, N), np.int8)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        )(jnp.asarray(x32), jnp.asarray(w))
        out.block_until_ready()
        print(f"  mosaic int32->int8 bitcast + int8 dot: COMPILED, "
              f"out[0,0]={int(out[0, 0])}")
        return True
    except Exception as e:
        print(f"  mosaic int32->int8 bitcast: FAILED "
              f"{type(e).__name__}: {str(e)[:200]}")
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="CPU bit-exactness only")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    if args.check:
        check_correctness()
        return

    import jax
    import jax.numpy as jnp
    from sesr_tpu.config import spec_for_task
    from sesr_tpu.ops.packed import _packed_fast_impl
    from sesr_tpu.ops.slab import packed_slab_forward
    from sesr_tpu.quant.integer import _hashable
    from sesr_tpu.quant.params import QuantParams

    spec = spec_for_task("sr_x2")
    qp = QuantParams.load(os.path.join(REPO, "artifacts",
                                       "qparams_sr_x2.npz"))
    qph = _hashable(qp)

    t0 = time.time()
    print("eating first-readback stall...", flush=True)
    y = jax.jit(lambda x: x * 2.0)(jnp.ones((8, 128)))
    _ = float(jnp.sum(y))
    print(f"stall eaten in {time.time() - t0:.0f}s", flush=True)

    print("mosaic feasibility:", flush=True)
    probe_mosaic_int8_bitcast()

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.random((1, 540, 960, 3), dtype=np.float32)))
    cands = {
        "A_dense": lambda c: _packed_fast_impl(spec, c, qph, (2, 4)),
        "B_hsplit": build_split_forward(spec, qp, (2, 4), "h"),
        "C_wsplit": build_split_forward(spec, qp, (2, 4), "w"),
        "D_tapsplit": build_split_forward(spec, qp, (2, 4), "tap"),
    }
    state = {}
    print(f"interleaved A/B on 540x960, {args.reps} reps:", flush=True)
    for rep in range(args.reps):
        print(f"  rep {rep}:", flush=True)
        for name, fn in cands.items():
            measure(fn, x, state, name)
    print("medians:")
    for name, vals in state.items():
        print(f"  {name}: {np.median(vals):.1f} Mpx/s "
              f"({[round(v, 1) for v in vals]})")

    # slab tiling at 1080p + batch serial, interleaved
    x_hd = jax.device_put(jnp.asarray(
        rng.random((1, 1080, 1920, 3), dtype=np.float32)))
    x_b8 = jax.device_put(jnp.asarray(
        rng.random((8, 540, 960, 3), dtype=np.float32)))
    state2 = {}
    cands2 = {
        "hd_mono": (x_hd, lambda c: _packed_fast_impl(spec, c, qph, (2, 4))),
        "hd_slab": (x_hd, lambda c: packed_slab_forward(spec, qp, c,
                                                        s=(2, 4))),
        "b8_batched": (x_b8, lambda c: _packed_fast_impl(spec, c, qph,
                                                         (2, 4))),
        "b8_serial": (x_b8, lambda c: packed_slab_forward(
            spec, qp, c, s=(2, 4), batch_serial=True)),
    }
    print("interleaved 1080p/batch probes, 3 reps:", flush=True)
    for rep in range(3):
        print(f"  rep {rep}:", flush=True)
        for name, (xx, fn) in cands2.items():
            try:
                measure(fn, xx, state2, name)
            except Exception as e:
                print(f"    {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
    print("medians:")
    for name, vals in state2.items():
        if vals:
            print(f"  {name}: {np.median(vals):.1f} Mpx/s "
                  f"({[round(v, 1) for v in vals]})")


if __name__ == "__main__":
    main()
