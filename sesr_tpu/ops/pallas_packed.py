"""Fused channel-packed whole-network inference as one Pallas TPU kernel.

Combines the two round-1/round-2 levers into the shipped deployment kernel:

- ops/pallas_pipeline.py's whole-net fusion (one kernel invocation per
  spatial tile runs ALL convs with every intermediate resident in VMEM;
  HBM traffic is one int8 read of the input tile and one int8 write of the
  output tile), and
- ops/packed.py's space-to-depth rewrite (s x s cells packed into channels
  so the per-conv matmuls contract/produce s^2*C = 64 channels instead of
  16, quadrupling MXU lane fill — the measured round-1 bottleneck).

Datapath: the CERTIFIED fast mode (quant/integer.py compute="fast" with
corrected=True) — single conv per layer, 20-bit adder clamp, clipped fused
bias, f32 requant, corrected integer residual add. The kernel therefore
refuses uncertified artifacts exactly like the XLA fast path, and is
asserted array-equal to it in tests/test_packed_pallas.py (interpret mode)
— which transitively pins it to the PE-exact interpreter and the
reference's own quan_func.py:298-493 semantics on saturation-free inputs.

Geometry: fixed-extent buffers with circular rolls, as in
ops/pallas_pipeline.py (Mosaic cannot lower shrinking-extent reshapes or
lane-concat of offset slices). In packed space every conv is a 3x3, so
wrap-around garbage penetrates exactly ONE packed ring per layer and the
halo ring is L cells (vs sum(k//2)=7 original pixels).

STATUS / PERFORMANCE (TPU v5e, SESR-x2 540x960, readback-synced K-diff
timing with a full-tensor-reduction consumer — see bench.py and the
CLAUDE.md note on why a sliced consumer under-reports ~5x): best measured
513 Mpx/s at s=(1,8), tile 56x40, dot_dtype="int8" (r4d interleaved
medians; 454 for the same config in the r4c session — chip drift), from
the round-4 retune at the W-only geometry (tile sweep r4a: t56x40 485 >
t32x64 398 > t104x24 340 bf16) plus the int8-MXU dot form (r4c/r4d:
int8 beats bf16 at every tile, ~+10-25%). 419 was the (2,4)-era best
(tile 40x64, bf16). The SHIPPED deployment path remains the XLA packed
lowering (ops/packed.py, 650-700 Mpx/s in the same sessions): the
kernel's binding cost is the in-VMEM neighbor-gather relayout
(pltpu.roll + per-qy lane-concat, ~98*C bytes per extent pixel,
invariant to packing factor AND to dot dtype) plus fixed-extent halo
overcompute (1.6-1.9x), while XLA's conv emitter folds the same gather
into its MXU pipeline. Round 4 measured all three dot forms to isolate
this: concat-bf16 412, concat-int8 454-513, per-tap dots (tap_dots=True,
NO lane-concat, K=128 MXU-native dots) int8 410 / bf16 312 — dropping
the concat LOSES (more weight-stationary swaps), so the relayout is the
rolls themselves, and every roll alternative is a recorded Mosaic wall
(see below). The "useful where HBM binds" hypothesis was tested and
REFUTED at deployment frame sizes: at 1080p the kernel measured 471 vs
the XLA path's 626 (f32 out) / 759 (int8 out) in the same process
(bench.py --all-paths, round-4 self-check) — the XLA path's narrow int8
boundaries already strip the inter-layer HBM traffic that whole-net VMEM
fusion saves. The kernel ships as the bit-exact Mosaic lowering proof of
the certified fast datapath and the recorded map of this toolchain's
kernel-authoring walls.

Measured Mosaic lowering walls (each an opaque remote-compile HTTP 500
unless noted): the out block's sublane dim (tile_w) must be 8-divisible
(explicit error); slab extents must be 8-aligned; extent widths E_w
beyond ~80-96 fail; live VMEM beyond ~16MB fails (s=4's C=256 buffers cap
it to smaller tiles than s=(2,4), costing it 2.3-2.8x); a flattened
single-roll-per-tap variant (sublane roll of the (M, C) view by
qy*E_w+qx) fails everywhere the 2D roll form compiles. Round 4: tile
96x40 fails in both dot dtypes (e_h=112 — the extent wall applies to the
H extent too at this width) and the tap-dot form fails at t56x64 and
t104x40 where the concat form's equivalents compile.

Round-3 closure of the int8-dot door (tools/bench_probe_r3b.py): packing
four int8 channels per int32 lane would keep the im2col rolls 32-bit
(legal) while the dots ran the measured-269-TFLOP/s int8 MXU path.
pltpu.bitcast(int32 -> int8) compiles and expands the SUBLANE dim 4x
with row layout 4m+b (byte b of word-row m, learned empirically) — but
separating the byte planes for per-plane int8 dots requires stride-4
sublane access or a sublane-merging reshape, both of which fail the
remote Mosaic compile (HTTP 500), and a single fused dot cannot apply
per-byte weight matrices. The int8 rate advantage is therefore
unreachable from packed words on this toolchain; the kernel remains the
bf16-dot form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sesr_tpu.config import SESRSpec
from sesr_tpu.ops.conv import pixel_shuffle_nhwc
from sesr_tpu.ops.packed import (depth_to_space_nhwc, pack_weight_hwio,
                                 packed_tap_range, space_to_depth_nhwc)
from sesr_tpu.quant.params import QuantParams


def _roll_neg(a, d: int, axis: int):
    """out[q] = a[q + d] (pltpu.roll: non-negative shifts, 32-bit data)."""
    n = a.shape[axis]
    return pltpu.roll(a, (n - d) % n, axis)


def _packed_layer_consts(spec: SESRSpec, qp: QuantParams, s,
                         dot_dtype: str = "bf16",
                         tap_dots: bool = False):
    """Per-layer kernel inputs: packed weights in per-qy im2col order
    (T_y, T_x*Cp_in, Cp_out) bf16 (or int8 for the int8-MXU dot form),
    the clipped fused bias tiled to packed channels (Cp_out,) f32, the
    (T_y, T_x) tap extents, and — int8 form only — the per-channel
    zero-correction vector z_eff * sum(W) (int32; see _conv_packed). At
    s_h, s_w >= 2 every packed kernel is 3x3; an UNPACKED axis (cell size
    1 — the (1,8) W-only default) keeps the original tap count there (5
    along H for the k=5 convs)."""
    hi = (1 << (qp.hw.bias_bits - 1)) - 1
    w_dt = jnp.int8 if dot_dtype == "int8" else jnp.bfloat16
    consts = []
    for i in range(qp.num_convs):
        wp = pack_weight_hwio(np.asarray(qp.w_int[i], np.float32), s)
        ty, tx, cpi, cpo = wp.shape
        assert ty % 2 == 1 and tx % 2 == 1, (ty, tx)
        w_cat = wp if tap_dots else wp.reshape(ty, tx * cpi, cpo)
        fused = np.clip(np.asarray(qp.bias_int[i]), -hi - 1, hi)
        cells = cpo // fused.shape[0]
        z_eff = float(qp.effective_zero(i))
        if dot_dtype == "int8":
            # the int8 form stores z_eff in the pad cells of an int8 buffer;
            # effective_zero floors at -128 but has no upper bound, so a
            # z_eff > 127 artifact would silently wrap there while the bf16
            # form stays correct — refuse instead of diverging.
            assert -128 <= z_eff <= 127, (
                f"layer {i}: effective zero {z_eff} does not fit int8; "
                "use dot_dtype='bf16' for this artifact")
        zc = np.asarray(np.round(z_eff * wp.sum(axis=(0, 1, 2))), np.int64)
        assert np.abs(zc).max() < 2 ** 31, zc
        consts.append((jnp.asarray(w_cat, w_dt),
                       jnp.asarray(np.tile(fused, cells), jnp.float32),
                       (ty, tx),
                       jnp.asarray(zc, jnp.int32)))
    return consts


def _conv_packed(x_shift, w_cat, fused, hw, ty: int = 3, tx: int = 3):
    """One packed T_y x T_x conv on a fixed (E_h, E_w, Cp_in) buffer:
    per-qy im2col (lane-concat of the T_x qx rolls of the qy-rolled rows)
    -> one MXU dot per qy, summed; then the 20-bit adder clamp and the
    clipped fused bias (the fast datapath of
    quant/integer.py:_integer_conv_pe).

    Why 2D circular rolls: the flattened single-roll-per-tap variant (one
    (M, C) sublane roll by qy*E_w+qx) fails the remote Mosaic compile on
    every real-TPU shape tried (HTTP 500, round-2 probes), while this form
    compiles. The roll/concat relayout traffic (~98*C bytes per extent
    pixel per conv, invariant to the packing factor) plus the fixed-extent
    halo overcompute are why the kernel trails the XLA packed lowering —
    see the module docstring's STATUS section for the measured numbers."""
    e_h, e_w, cpi = x_shift.shape
    cpo = w_cat.shape[-1]
    ry, rx = (ty - 1) // 2, (tx - 1) // 2
    add_lo = float(-(1 << (hw.pe_add_bits - 1)))
    add_hi = float((1 << (hw.pe_add_bits - 1)) - 1)
    acc = None
    for qy in range(ty):
        row = x_shift if qy == ry else _roll_neg(x_shift, qy - ry, 0)
        patch = jnp.concatenate(
            [(row if qx == rx else _roll_neg(row, qx - rx, 1))
             .astype(jnp.bfloat16) for qx in range(tx)], axis=2)
        d = jnp.dot(patch.reshape(e_h * e_w, tx * cpi), w_cat[qy],
                    preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    y = jnp.clip(acc.reshape(e_h, e_w, cpo), add_lo, add_hi)
    return y + fused


def _conv_packed_int8(x_int, w_cat, fused, zc, hw, ty: int = 3,
                      tx: int = 3):
    """The int8-MXU form of _conv_packed: the input buffer carries the raw
    quantized values q (int8-exact) with the pad cells holding z_eff
    instead of the shifted q - z_eff (whose range [-255, 255] does NOT fit
    int8), so the per-tap casts produce genuine int8 operands for the
    measured-269-TFLOP/s int8 MXU path (tools/bench_probe_pallas_int8.py;
    int32 accumulator). The conv the datapath wants is conv(q - z_eff)
    with zero pads == conv(q, pads=z_eff) - z_eff*sum(W), so the
    correction zc (host-side int32, per output channel) is subtracted
    BEFORE the 20-bit adder clamp — the clamped quantity is bit-identical
    to the bf16 form's. Rolls stay on the f32 buffer (pltpu.roll is
    32-bit-only; this route needs no packed words, so the r3b closure —
    byte-plane separation of packed int8 — does not apply)."""
    e_h, e_w, cpi = x_int.shape
    cpo = w_cat.shape[-1]
    ry, rx = (ty - 1) // 2, (tx - 1) // 2
    add_lo = -(1 << (hw.pe_add_bits - 1))
    add_hi = (1 << (hw.pe_add_bits - 1)) - 1
    acc = None
    for qy in range(ty):
        row = x_int if qy == ry else _roll_neg(x_int, qy - ry, 0)
        patch = jnp.concatenate(
            [(row if qx == rx else _roll_neg(row, qx - rx, 1))
             .astype(jnp.int8) for qx in range(tx)], axis=2)
        d = jnp.dot(patch.reshape(e_h * e_w, tx * cpi), w_cat[qy],
                    preferred_element_type=jnp.int32)
        acc = d if acc is None else acc + d
    y = jnp.clip(acc.reshape(e_h, e_w, cpo) - zc, add_lo, add_hi)
    return y.astype(jnp.float32) + fused


def _conv_packed_tapdots(x_in, w_tap, fused, zc, hw, ty: int, tx: int,
                         dot8: bool):
    """Per-tap-dot form: NO lane-concat at all — one (M, Cp_in) x
    (Cp_in, Cp_out) dot per (qy, qx) tap, accumulated. K = Cp_in = 128 is
    the MXU-native contraction size, and the im2col concat (the measured
    relayout cost of _conv_packed) disappears; only the 2D rolls remain.
    w_tap: (T_y, T_x, Cp_in, Cp_out). dot8 selects the int8-MXU operand
    form (x_in carries raw q with z_eff pads; zc subtracted pre-clamp) vs
    bf16 (x_in carries q - z_eff with zero pads; zc unused — None)."""
    e_h, e_w, cpi = x_in.shape
    cpo = w_tap.shape[-1]
    ry, rx = (ty - 1) // 2, (tx - 1) // 2
    add_lo = -(1 << (hw.pe_add_bits - 1))
    add_hi = (1 << (hw.pe_add_bits - 1)) - 1
    in_dt = jnp.int8 if dot8 else jnp.bfloat16
    acc_dt = jnp.int32 if dot8 else jnp.float32
    acc = None
    for qy in range(ty):
        row = x_in if qy == ry else _roll_neg(x_in, qy - ry, 0)
        for qx in range(tx):
            tap = row if qx == rx else _roll_neg(row, qx - rx, 1)
            d = jnp.dot(tap.astype(in_dt).reshape(e_h * e_w, cpi),
                        w_tap[qy, qx], preferred_element_type=acc_dt)
            acc = d if acc is None else acc + d
    y = acc.reshape(e_h, e_w, cpo)
    if dot8:
        y = jnp.clip(y - zc, add_lo, add_hi).astype(jnp.float32)
    else:
        y = jnp.clip(y, float(add_lo), float(add_hi))
    return y + fused


def build_pallas_packed_forward(spec: SESRSpec, qp: QuantParams,
                                H: int, W: int, *, s: int = 2,
                                tile_h: int = 32, tile_w: int = 128,
                                batch: int = 1, g=None,
                                dot_dtype: str = "bf16",
                                tap_dots: bool = False,
                                interpret: bool = False):
    """Compile the fused packed forward for a fixed input size.

    Same contract as integer_forward's output (dequantized float, pixel
    shuffle applied): f(x: (batch, H, W, C) float) -> float output.
    H, W must be multiples of s (deployment frame sizes are; odd sizes fall
    back to ops/packed.py's XLA lowering, which masks partial cells).
    dot_dtype: "bf16" (default) or "int8" — both bit-exact; int8 runs the
    dots on the int8 MXU path (~1.85x the bf16 rate) via the pad-at-zero /
    pre-clamp-correction form of _conv_packed_int8.
    """
    assert dot_dtype in ("bf16", "int8"), dot_dtype
    dot8 = dot_dtype == "int8"
    if not getattr(qp, "fast_cert_ok", False):
        raise ValueError(
            "the fused packed kernel lowers the certified fast datapath "
            "and requires a certified QuantParams (quant/certify.py)")
    from sesr_tpu.ops.packed import _s2
    sh, sw = _s2(s)
    assert H % sh == 0 and W % sw == 0, (H, W, s)
    hw = qp.hw
    L = spec.num_convs
    consts = _packed_layer_consts(spec, qp, (sh, sw), dot_dtype, tap_dots)
    # wrap garbage penetrates (T-1)//2 cells per layer PER AXIS (1 for
    # packed axes where every kernel is 3-tap; k//2 for an unpacked axis,
    # e.g. 2 cells/k=5-layer along H at (1,8)), so each ring must be >=
    # the per-axis sum; tile+2g extents must stay 8-aligned for the DMA
    # slabs and the in-kernel sublane-merging reshape
    need_h = sum((ty - 1) // 2 for _, _, (ty, _tx), _zc in consts)
    need_w = sum((tx - 1) // 2 for _, _, (_ty, tx), _zc in consts)
    if g is None:
        g = (-(-need_h // 4) * 4, -(-need_w // 4) * 4)
    g_h, g_w = (g, g) if isinstance(g, int) else g
    assert g_h >= need_h and g_w >= need_w, (g, need_h, need_w)
    # measured Mosaic rules (round-2 probes): the out block's sublane dim
    # (tile_w) must be 8-divisible, and both slab extents 8-aligned
    assert tile_w % 8 == 0, tile_w
    assert (tile_h + 2 * g_h) % 8 == 0 and (tile_w + 2 * g_w) % 8 == 0, \
        (tile_h, tile_w, g)
    Hs, Ws = H // sh, W // sw
    qmin = float(-(1 << (hw.quan_bits - 1)))
    qmax = float((1 << (hw.quan_bits - 1)) - 1)

    Hp = -(-Hs // tile_h) * tile_h
    Wp = -(-Ws // tile_w) * tile_w
    cpi = sh * sw * spec.in_channels
    cpo = sh * sw * spec.conv_out_channels

    # zc is only a kernel operand in the int8 forms — the bf16 forms never
    # read it, and dead VMEM operands are real cost on a toolchain whose
    # compile walls include VMEM pressure and operand structure
    n_ops = 3 if dot8 else 2

    def kernel(x_ref, *rest):
        out_ref = rest[n_ops * L]
        # grid = (batch * nth, ntw): batch is folded into the leading grid
        # dim so the call keeps the 5D-slab / 2D-grid structure the Mosaic
        # service is known to lower (ops/pallas_pipeline.py)
        th = pl.program_id(0) % nth
        tw = pl.program_id(1)
        row0 = th * tile_h - g_h
        col0 = tw * tile_w - g_w
        e_h, e_w = tile_h + 2 * g_h, tile_w + 2 * g_w

        rows = lax.broadcasted_iota(jnp.int32, (e_h, e_w, 1), 0) + row0
        cols = lax.broadcasted_iota(jnp.int32, (e_h, e_w, 1), 1) + col0
        # packed-cell granularity: H, W are multiples of s, so a cell is
        # fully in-image or fully out; flattened to the (M, C) roll layout
        inside = ((rows >= 0) & (rows < Hs) & (cols >= 0) & (cols < Ws))

        h_buf = x_ref[0, 0].astype(jnp.float32)
        shortcut = None
        for i in range(L):
            z_eff = float(qp.effective_zero(i))
            if i == 0:
                xq_i = h_buf
            elif i < L - 1:
                xq_i = jnp.clip(jnp.round(h_buf + jnp.float32(qp.a_zero[i])),
                                qmin, qmax)
            else:
                # corrected integer residual add (quant/integer.py
                # _quantize_domain_in, corrected=True)
                t = jnp.round(shortcut) + jnp.round(h_buf)
                t = (t * jnp.float32(float(qp.res_requant_m))) \
                    * jnp.float32(2.0 ** (-qp.res_requant_n))
                xq_i = jnp.clip(jnp.round(t + jnp.float32(qp.a_zero[i])),
                                qmin, qmax)
            w_ref, b_ref = rest[n_ops * i], rest[n_ops * i + 1]
            zc_ref = rest[n_ops * i + 2] if dot8 else None
            ty_i, tx_i = consts[i][2]
            if dot8:
                # pad cells hold z_eff (not the shifted 0) so the buffer
                # stays int8-exact; the z_eff*sum(W) correction is
                # subtracted pre-clamp inside the conv helper
                x_in = jnp.where(inside, xq_i, jnp.float32(z_eff))
            else:
                x_in = jnp.where(inside, xq_i - jnp.float32(z_eff), 0.0)
            if tap_dots:
                y = _conv_packed_tapdots(x_in, w_ref[...], b_ref[...],
                                         zc_ref[...] if dot8 else None,
                                         hw, ty_i, tx_i, dot8)
            elif dot8:
                y = _conv_packed_int8(x_in, w_ref[...], b_ref[...],
                                      zc_ref[...], hw, ty_i, tx_i)
            else:
                y = _conv_packed(x_in, w_ref[...], b_ref[...], hw,
                                 ty_i, tx_i)
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
                out_ref[...] = out_q[g_h:g_h + tile_h,
                                     g_w:g_w + tile_w, :].astype(jnp.int8)

    grid = (Hp // tile_h, Wp // tile_w)
    nth, ntw = grid
    hs_, ws_ = tile_h + 2 * g_h, tile_w + 2 * g_w
    flat_consts, const_specs = [], []
    for (w_cat, fused, _t, zc) in consts:
        for a in ((w_cat, fused, zc) if dot8 else (w_cat, fused)):
            const_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            flat_consts.append(a)

    call = pl.pallas_call(
        kernel,
        grid=(batch * nth, ntw),
        # overlapping halo'd slabs are pre-materialized by XLA (overlapping
        # BlockSpecs are not expressible — see ops/pallas_pipeline.py)
        in_specs=[pl.BlockSpec((1, 1, hs_, ws_, cpi),
                               lambda t, tw: (t, tw, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + const_specs,
        out_specs=pl.BlockSpec(
            (tile_h, tile_w, cpo), lambda t, tw: (t, tw, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch * Hp, Wp, cpo), jnp.int8),
        interpret=interpret,
    )

    s0, z0 = qp.a_scale[0], qp.a_zero[0]
    sL, zL = qp.a_scale[L], qp.a_zero[L]

    @jax.jit
    def forward(x):
        assert x.shape == (batch, H, W, spec.in_channels), x.shape
        x = x.astype(jnp.float32)
        x_q = jnp.clip(jnp.round(x / jnp.float32(s0) + jnp.float32(z0)),
                       qmin, qmax)
        x_p = space_to_depth_nhwc(x_q, (sh, sw))
        x_p = jnp.pad(x_p, ((0, 0), (g_h, g_h + Hp - Hs),
                            (g_w, g_w + Wp - Ws), (0, 0))).astype(jnp.int8)
        slabs = jnp.stack([
            jnp.stack([
                lax.slice(x_p, (0, th * tile_h, tw * tile_w, 0),
                          (batch, th * tile_h + hs_, tw * tile_w + ws_, cpi))
                for tw in range(ntw)])
            for th in range(nth)]).transpose(2, 0, 1, 3, 4, 5) \
            .reshape(batch * nth, ntw, hs_, ws_, cpi)
        out = call(slabs, *flat_consts) \
            .reshape(batch, Hp, Wp, cpo)[:, :Hs, :Ws, :]
        y = depth_to_space_nhwc(out, (sh, sw)).astype(jnp.float32)
        y = (y - jnp.float32(zL)) * jnp.float32(sL)
        if spec.has_pixel_shuffle:
            y = pixel_shuffle_nhwc(y, spec.scaling_factor)
        return y

    return forward
