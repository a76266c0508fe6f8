"""Fused whole-network int8 inference as a single Pallas TPU kernel.

One kernel invocation per spatial tile runs ALL collapsed convs with every
intermediate resident in VMEM: HBM traffic is one int8 read of the input tile
(+halo) and one int8 write of the output tile — the XLA path materializes
each layer's activations in HBM instead. The 4-PE saturating datapath of the
reference ASIC (SURVEY §2.1) is preserved bit-exactly:

- convs are computed as k*k shifted matmuls on the MXU. Inputs are zero-point
  -shifted int values in [-255, 255] and weights int8 — both exact in
  bfloat16 (8 significand bits ≥ 9-bit magnitudes / 256), products exact in
  the MXU's float32 accumulator (all sums < 2^24), so bf16 x bf16 -> f32
  matmuls reproduce integer arithmetic exactly at full MXU rate.
- per-PE partial sums (input channels round-robin, quan_func.py:298-318) get
  the zero-restoration term and saturate at 18 bits BEFORE the 4-way sum
  saturates at 20 bits (quan_func.py:336-370, 428-437) — the saturation
  ORDER is semantically load-bearing.
- requantization multiplies by the 16-bit mantissa then by 2^-n in float32,
  reproducing the reference's observable f32 rounding (quan_func.py:529).
- image borders: every conv's out-of-image input region is masked to zero in
  the SHIFTED domain — identical to the monolithic SAME conv's zero padding
  (and to the ppermute-zeros of the sharded path, ops/halo.py).

The kernel carries the layer-0 residual shortcut as an f32 VMEM value and
performs the integer residual add of the last conv's input in-kernel
(quan_func.py:244-270).

Bit-exactness vs quant/integer.py is asserted in tests/test_pallas.py
(interpret mode on CPU) and verified identical on a real TPU v5e.

STATUS / PERFORMANCE (TPU v5e, SESR-x2 540x960, readback-synced timing —
see bench.py for why naive timing lies on this backend): this kernel runs
at ~21 Mpx/s, on par with the XLA bf16 PE-exact interpreter (~22 Mpx/s)
and 5x faster than the literal int32 lowering (~4 Mpx/s). Its current
bound is VPU data movement: with C=16 channels on the 128-wide lane
dimension every f32 VMEM buffer is 8x padded, and the per-tap circular
rolls + lane-concats are relayouts of those padded buffers that rival the
MXU matmul time. The channel-packed (space-to-depth) tile layout built in
round 2 fixes this — see ops/pallas_packed.py (419 Mpx/s fused kernel) and
ops/packed.py (the shipped XLA lowering, ~600 Mpx/s). This unpacked kernel
is kept as the PE-exact fused variant and the minimal Mosaic lowering of
the datapath.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sesr_tpu.config import SESRSpec
from sesr_tpu.ops.conv import pixel_shuffle_nhwc
from sesr_tpu.quant.params import QuantParams


def _layer_constant_arrays(qp: QuantParams):
    """Per-layer device inputs for the kernel: PE-masked bf16 weights
    pre-flattened to im2col order (PE, k*k*IC, OC), zero-restoration terms
    (PE, OC) f32, fused biases (OC,) f32. Pallas kernels may not close over
    array constants, so these travel as pallas_call inputs; the weight
    flattening happens here on the host because in-kernel reshapes of
    lane-unaligned dims are not lowerable."""
    arrays = []
    for i in range(qp.num_convs):
        w = np.asarray(qp.w_int[i])                     # HWIO int
        k, _, ic, oc = w.shape
        c = np.arange(ic)
        z_eff = qp.effective_zero(i)
        pe_w, pe_z = [], []
        for p in range(qp.hw.pe):
            wp = w * (c % qp.hw.pe == p)[None, None, :, None]
            # flattened per-dy: (k, k*ic, oc) in (dx, ic) order
            pe_w.append(wp.reshape(k, k * ic, oc).astype(np.float32))
            pe_z.append((wp.sum(axis=(0, 1, 2)) * z_eff).astype(np.float32))
        arrays.append((
            jnp.asarray(np.stack(pe_w)).astype(jnp.bfloat16),
            jnp.asarray(np.stack(pe_z)),
            jnp.asarray(qp.fused_bias(i), jnp.float32),
        ))
    return arrays


def _roll_neg(a, d: int, axis: int):
    """Circular shift so that out[q] = a[q + d] (pltpu.roll only accepts
    non-negative shifts, and only on 32-bit data — roll f32, cast after)."""
    n = a.shape[axis]
    return pltpu.roll(a, (n - d) % n, axis)


def _conv_pe_exact(x_shift, w_cat, zsum, fused, k: int, hw):
    """PE-split conv with 18/20-bit saturation + fused bias, on a FIXED
    buffer extent (E_h, E_w, C) -> (E_h, E_w, OC).

    Every layer keeps the same (aligned) extent: each of the k*k taps is a
    circular roll of the buffer, lane-concatenated into an im2col patch
    matrix, so each PE is ONE dense (E_h*E_w, k*k*C) x (k*k*C, OC) MXU
    matmul. Wrap-around garbage penetrates <= k//2 into the halo ring per
    layer — bounded by the ring width, like the shrinking-extent scheme.
    This formulation is forced by Mosaic lowering constraints, measured:
    shrinking extents make slice reshapes unlowerable (sublane-unaligned),
    per-tap dots blow compile time superlinearly (13s vs 1.5s per layer)
    and per-tap relayout copies OOM VMEM; rolls normalize layout offsets so
    the concat is legal and compile stays seconds.

    One dot per PE also means each PE's partial sum is complete before its
    18-bit saturation — the reference's accumulate-then-clamp per PE
    (quan_func.py:336-370)."""
    e_h, e_w, ic = x_shift.shape
    oc = w_cat.shape[-1]
    acc_lo = float(-(1 << (hw.pe_acc_bits - 1)))
    acc_hi = float((1 << (hw.pe_acc_bits - 1)) - 1)
    add_lo = float(-(1 << (hw.pe_add_bits - 1)))
    add_hi = float((1 << (hw.pe_add_bits - 1)) - 1)

    r = k // 2
    # per-dy im2col: lane-concat the k dx-taps of one kernel row
    # (K = k*ic <= 80 lanes — full patches at K = k*k*ic would need ~5MB
    # VMEM buffers per layer and overflow the 16MB budget)
    total = None
    for p in range(hw.pe):
        acc = None
        for dy in range(k):
            row = _roll_neg(x_shift, dy - r, 0)
            row_patch = jnp.concatenate(
                [_roll_neg(row, dx - r, 1).astype(jnp.bfloat16)
                 for dx in range(k)], axis=2)
            d = jnp.dot(row_patch.reshape(e_h * e_w, k * ic), w_cat[p, dy],
                        preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        acc = acc.reshape(e_h, e_w, oc) + zsum[p]
        acc = jnp.clip(acc, acc_lo, acc_hi)              # 18-bit PE saturation
        total = acc if total is None else total + acc
    total = jnp.clip(total, add_lo, add_hi)              # 20-bit adder saturation
    return total + fused


def build_pallas_forward(spec: SESRSpec, qp: QuantParams, H: int, W: int,
                         tile_h: int = 32, tile_w: int = 128,
                         interpret: bool = False):
    """Compile a fused forward for a fixed input size.

    Returns f(x_nhwc_float) -> dequantized float output (same contract as
    integer_forward; pixel shuffle applied outside the kernel).
    """
    hw = qp.hw
    L = spec.num_convs
    const_arrays = _layer_constant_arrays(qp)
    halo = spec.halo_width()
    # Mosaic requires DMA slab extents aligned to the 8-sublane tiling, so
    # the geometric halo rounds up to a multiple of 8; the surplus ring is
    # masked like any out-of-image region and sliced off the final tile.
    g = -(-halo // 8) * 8
    surplus = g - halo
    ks = spec.kernel_sizes
    qmin = float(-(1 << (hw.quan_bits - 1)))
    qmax = float((1 << (hw.quan_bits - 1)) - 1)
    half = float(1 << (hw.quan_bits - 1))

    Hp = -(-H // tile_h) * tile_h
    Wp = -(-W // tile_w) * tile_w
    c_in, c_out = spec.in_channels, spec.conv_out_channels

    def kernel(x_ref, *rest):
        out_ref = rest[3 * L]
        th = pl.program_id(0)
        tw = pl.program_id(1)
        # buffer origin in image coordinates (negative inside the halo);
        # every layer shares the same fixed (E_h, E_w) coordinate frame
        row0 = th * tile_h - g
        col0 = tw * tile_w - g
        e_h, e_w = tile_h + 2 * g, tile_w + 2 * g

        rows = jax.lax.broadcasted_iota(jnp.int32, (e_h, e_w, 1), 0) + row0
        cols = jax.lax.broadcasted_iota(jnp.int32, (e_h, e_w, 1), 1) + col0
        inside = ((rows >= 0) & (rows < H) & (cols >= 0) & (cols < W))

        x_q = x_ref[0, 0].astype(jnp.float32)            # (E_h, E_w, C)
        shortcut = None
        h_buf = x_q
        for i in range(L):
            z = float(qp.effective_zero(i))
            if i == 0:
                xq_i = h_buf
            elif i < L - 1:
                xq_i = jnp.clip(jnp.round(h_buf + jnp.float32(qp.a_zero[i])),
                                qmin, qmax)
            else:
                # integer residual add (quan_func.py:244-270); the shortcut
                # lives in the same fixed coordinate frame — no margin
                res_c = jnp.clip(jnp.round(shortcut - half), qmin, qmax)
                in_c = jnp.clip(jnp.round(h_buf - half), qmin, qmax)
                t = res_c + in_c + 2.0 * half
                t = (t * jnp.float32(float(qp.res_requant_m))) \
                    * jnp.float32(2.0 ** (-qp.res_requant_n))
                xq_i = jnp.clip(jnp.round(t + jnp.float32(qp.a_zero[i])),
                                qmin, qmax)

            # shift + zero the out-of-image region (== SAME zero padding)
            x_shift = jnp.where(inside, xq_i - jnp.float32(z), 0.0)

            w_ref, z_ref, b_ref = rest[3 * i], rest[3 * i + 1], rest[3 * i + 2]
            y = _conv_pe_exact(x_shift, w_ref[...], z_ref[...], b_ref[...],
                               ks[i], hw)
            y = (y * jnp.float32(float(qp.requant_m[i]))) \
                * jnp.float32(2.0 ** (-qp.requant_n[i]))

            if i == 0:
                shortcut = jax.nn.relu(y)
                h_buf = shortcut
            elif i < L - 1:
                h_buf = jax.nn.relu(y)
            else:
                out_q = jnp.clip(jnp.round(y + jnp.float32(qp.a_zero[L])),
                                 qmin, qmax)
                out_ref[...] = out_q[g:g + tile_h, g:g + tile_w, :] \
                    .astype(jnp.int8)

    grid = (Hp // tile_h, Wp // tile_w)
    nth, ntw = grid
    hs, ws = tile_h + 2 * g, tile_w + 2 * g
    const_specs = []
    flat_consts = []
    for (w_all, zsum, fused) in const_arrays:
        for a in (w_all, zsum, fused):
            const_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            flat_consts.append(a)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        # halo'd slabs overlap between tiles, which BlockSpec blocking cannot
        # express (and Mosaic cannot DMA-slice lane-unaligned C), so the
        # overlapping slabs are materialized by XLA outside the kernel as a
        # (nth, ntw, hs, ws, C) int8 tensor and blocked conventionally.
        in_specs=[pl.BlockSpec((1, 1, hs, ws, c_in),
                               lambda th, tw: (th, tw, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + const_specs,
        out_specs=pl.BlockSpec(
            (tile_h, tile_w, c_out), lambda th, tw: (th, tw, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp, c_out), jnp.int8),
        interpret=interpret,
    )

    s0, z0 = qp.a_scale[0], qp.a_zero[0]
    sL, zL = qp.a_scale[L], qp.a_zero[L]

    @jax.jit
    def forward(x):
        assert x.shape == (1, H, W, c_in), x.shape
        x = x[0].astype(jnp.float32)
        x_q = jnp.clip(jnp.round(x / jnp.float32(s0) + jnp.float32(z0)),
                       qmin, qmax)
        # pad: halo + round-up-to-tile; padded values are masked in-kernel
        x_q = jnp.pad(x_q, ((g, g + Hp - H), (g, g + Wp - W),
                            (0, 0))).astype(jnp.int8)
        slabs = jnp.stack([
            jnp.stack([
                lax.slice(x_q, (th * tile_h, tw * tile_w, 0),
                          (th * tile_h + hs, tw * tile_w + ws, c_in))
                for tw in range(ntw)])
            for th in range(nth)])
        out = call(slabs, *flat_consts)[None, :H, :W, :]
        y = (out.astype(jnp.float32) - jnp.float32(zL)) * jnp.float32(sL)
        if spec.has_pixel_shuffle:
            y = pixel_shuffle_nhwc(y, spec.scaling_factor)
        return y

    return forward
