"""Bit-exact integer interpreter — the ASIC datapath (reference `sim.py`,
exe_mode=1).

Replicates, value for value, the reference's integer pipeline
(quan_func.py + the sim-model graph), per conv i:

  1. domain-in:  conv 0 quantizes from float (quan_func.py:220-225); middle
     convs add their zero point with an int8 clamp (:272-280); the LAST conv
     does the integer residual add (:244-270). The value fed to the conv is
     q - max(zero, -128), because zero-padding must be exact (:289-293).
  2. 4-PE partial convs (input channels round-robin, :298-318) in int32.
  3. per-PE zero restoration + saturation to PE_ACC_BIT (:336-370) — the
     restored zero is floored at -128 (:351-352).
  4. 4-way PE sum saturated to PE_ADD_BIT (:428-437).
  5. fused bias add: clamp(bias_int - zero*sum(W_int), +-2^(BIAS_BIT-1))
     (:480-491) — using the UNfloored zero (upstream quirk, replicated).
  6. requantization by a 16-bit mantissa x 2^-n with float32 rounding
     (:517-611), wired per requant_target_domain(); conv 0 additionally
     saves its post-ReLU output as the residual shortcut (:530-549); the
     last conv re-quantizes into the output domain with a zero add + int8
     clamp, then dequantizes for scoring (:579-594).

Everything is jnp (int32 for accumulations, float32 where the reference's
float32 rounding is observable); jit-compatible; shapes NHWC.

All integer values below 2^24 are exactly representable in float32, which is
why the reference's float32 tensors and our int32 arithmetic agree bit-for-
bit everywhere except the requant multiply — where we deliberately compute
in float32 (ops/fixedpoint.py:apply_requant_f32).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sesr_tpu.config import SESRSpec, HardwareConfig
from sesr_tpu.models.sesr import CollapsedParams
from sesr_tpu.ops.conv import conv2d_nhwc, pixel_shuffle_nhwc
from sesr_tpu.ops.fixedpoint import apply_requant_f32, saturate
from sesr_tpu.quant.params import QuantParams, requant_target_domain


def pe_channel_mask(ic: int, pe: int, p: int) -> np.ndarray:
    """The ONE channel round-robin rule of the PE decomposition
    (quan_func.py:298-318): input channel c belongs to PE p iff
    c % pe == p. Every masking site (this module, the fake-quant clamps in
    quant/calibrate.py, the interval proofs in quant/certify.py) derives
    from this helper so the rule cannot desynchronize."""
    return (np.arange(ic) % pe == p)


def _pe_weight_masks(w_int_hwio: np.ndarray, pe: int):
    """w_int split into `pe` kernels (input channels c % pe == p kept)."""
    ic = w_int_hwio.shape[2]
    return [w_int_hwio
            * pe_channel_mask(ic, pe, p)[None, None, :, None].astype(
                w_int_hwio.dtype)
            for p in range(pe)]


def _quantize_domain_in(x, i: int, L: int, qp: QuantParams, shortcut,
                        corrected: bool = False):
    """Domain-in handling (quan_func.py:217-293). Returns (x_q, x_shift):
    x_q is the int8 tensor the reference dumps as input.{i}.pt; x_shift is
    x_q - max(zero, -128), the value actually convolved.

    corrected=True widens the integer residual add: the reference shifts
    both operands by -128 and clamps them to int8 BEFORE adding
    (quan_func.py:250-252), which clips any branch value above 255 in the
    shared domain-1 scale — measured on the shipped sr_x4 checkpoint the
    branch reaches ~300. The corrected path adds the rounded operands at
    16-bit width (a uint9+uint9 add, trivially representable in hardware)
    and clamps only at the final int8 write."""
    bits = qp.hw.quan_bits
    qmin, qmax = float(-(1 << (bits - 1))), float((1 << (bits - 1)) - 1)
    zero = qp.a_zero[i]
    if i == 0:
        scale = qp.a_scale[0]
        x_q = jnp.clip(jnp.round(x / jnp.float32(scale) + jnp.float32(zero)),
                       qmin, qmax)
    elif i == L - 1:
        # integer residual add (quan_func.py:244-270): shortcut and branch
        # both live in domain-1 scale; shift to signed, add, rescale by
        # s_1/s_{L-1}, move into domain L-1
        half = float(1 << (bits - 1))
        if corrected:
            t = jnp.round(shortcut) + jnp.round(x)
        else:
            res_c = jnp.clip(jnp.round(shortcut - half), qmin, qmax)
            in_c = jnp.clip(jnp.round(x - half), qmin, qmax)
            t = res_c + in_c + 2.0 * half
        t = apply_requant_f32(t, qp.res_requant_m, qp.res_requant_n)
        x_q = jnp.clip(jnp.round(t + jnp.float32(zero)), qmin, qmax)
    else:
        x_q = jnp.clip(jnp.round(x + jnp.float32(zero)), qmin, qmax)
    x_shift = x_q - jnp.float32(qp.effective_zero(i))
    return x_q, x_shift


def _integer_conv_pe(x_shift, i: int, qp: QuantParams, halo_axis=None,
                     corrected: bool = False, compute: str = "bf16"):
    """Steps 2-5: PE-split int32 conv, zero restoration, saturations, fused
    bias. Returns (pe_out [(PE, N, H, W, OC) clamped], pe_add, y_biased,
    ovf18 [per-layer 18-bit event count]).

    With halo_axis set (sharded execution inside shard_map), the SHIFTED
    tensor exchanges its k//2 halo — zero there == the zero padding
    F.conv2d applies upstream (quan_func.py:289-293) — and convs run in
    valid mode along the exchanged axes. halo_axis is either a single mesh
    axis name (W sharding) or an (h_axis, w_axis) pair (2D spatial mesh;
    ops/halo.py halo_exchange_2d).

    compute="bf16" (default) runs each per-PE partial conv on the MXU as a
    channel-sliced bfloat16 x bfloat16 -> float32 convolution. This is
    BIT-EXACT with int32 arithmetic for this datapath by range analysis:
    shifted inputs are in [-255, 255] and weights in [-128, 127] — both
    exact in bfloat16 (8 significand bits) — and every partial sum stays
    below 2^24, exact in the float32 accumulator. Measured with a
    readback-synced harness, the int32 lowering runs on the VPU at ~140 ms
    per 540x960 frame while the bf16 path uses the MXU; channel slicing
    (x[..., p::PE] against w[:, :, p::PE, :]) also removes the 4x
    masked-weight overhead, since summing a channel subset equals the
    masked conv exactly in f32. compute="int32" keeps the literal integer
    lowering for audit.

    corrected=True fixes a structural flaw in the reference datapath: the
    zero-point correction z*sum(W_int) reaches ~2*10^5 for the shipped
    checkpoints, but the reference first ADDS it into the 18-bit per-PE
    accumulator (quan_func.py:353-356, often saturating on its own) and then
    SUBTRACTS it inside the 16-bit fused-bias register (:480-486, where it
    clamps at +-32767) — silently destroying most of the correction. (The
    reference never scored this path; its sim.py PSNR loop is commented
    out, sim.py:146-195.) The corrected mode uses the algebraically equal
    but representable form conv(x_q - z) + bias_int directly: no
    restoration, no correction in the bias, every term in range. Default is
    the bit-exact reference behaviour (required for RTL vector parity)."""
    from sesr_tpu.ops.halo import halo_exchange_2d, halo_exchange_w

    hw = qp.hw
    w_int = qp.w_int[i]
    zero_eff = qp.effective_zero(i)
    x_i32 = x_shift.astype(jnp.int32)
    w_valid = halo_axis is not None
    h_valid = isinstance(halo_axis, tuple) and halo_axis[0] is not None
    if h_valid:
        x_i32 = halo_exchange_2d(x_i32, w_int.shape[0] // 2, *halo_axis)
    elif isinstance(halo_axis, tuple):
        # (None, w_axes): W sharded over a combined axis group (multihost
        # tail forward) — plain W exchange over the flattened axes
        x_i32 = halo_exchange_w(x_i32, w_int.shape[0] // 2, halo_axis[1])
    elif w_valid:
        x_i32 = halo_exchange_w(x_i32, w_int.shape[0] // 2, halo_axis)

    if compute == "fast":
        # deployment fast path: ONE full-channel bf16 conv per layer, no
        # per-PE split. Identical to the exact path whenever the 18-bit
        # per-PE saturation never fires (certify with the overflow counters
        # or quant/strict.py); the 20-bit adder clamp is still applied.
        assert corrected, "fast compute implies the corrected datapath"
        y = conv2d_nhwc(x_i32.astype(jnp.bfloat16),
                        jnp.asarray(np.asarray(w_int, np.float32),
                                    jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                        w_valid=w_valid, h_valid=h_valid).astype(jnp.int32)
        pe_add = saturate(y, hw.pe_add_bits)
        hi16 = (1 << (hw.bias_bits - 1)) - 1
        fused = jnp.asarray(np.clip(qp.bias_int[i], -hi16 - 1, hi16), jnp.int32)
        zero_ovf = jnp.zeros((2,), jnp.int32)
        return pe_add[None], pe_add, pe_add + fused, zero_ovf

    pe_outs = []
    ovf18 = jnp.zeros((), jnp.int32)
    x_bf = x_i32.astype(jnp.bfloat16) if compute == "bf16" else None
    masks = _pe_weight_masks(w_int, hw.pe) if compute != "bf16" else None
    for p in range(hw.pe):
        if compute == "bf16":
            w_p_sl = np.ascontiguousarray(w_int[:, :, p::hw.pe, :])
            y_p = conv2d_nhwc(x_bf[..., p::hw.pe],
                              jnp.asarray(w_p_sl.astype(np.float32),
                                          jnp.bfloat16),
                              preferred_element_type=jnp.float32,
                              w_valid=w_valid, h_valid=h_valid).astype(jnp.int32)
            w_sum_p = w_p_sl.sum(axis=(0, 1, 2))
        else:
            w_p = masks[p]
            y_p = conv2d_nhwc(x_i32, jnp.asarray(w_p, jnp.int32),
                              preferred_element_type=jnp.int32,
                              w_valid=w_valid, h_valid=h_valid)
            w_sum_p = w_p.sum(axis=(0, 1, 2))                # (OC,)
        if not corrected:
            y_p = y_p + jnp.asarray(w_sum_p * zero_eff, jnp.int32)
        y_sat = saturate(y_p, hw.pe_acc_bits)
        # numeric sanitizer: count saturating accumulations (the reference's
        # max_overflow/min_overflow print sentinels, quan_func.py:357-361)
        ovf18 = ovf18 + jnp.sum((y_p != y_sat).astype(jnp.int32))
        pe_outs.append(y_sat)
    pe_out = jnp.stack(pe_outs, axis=0)                      # (PE, N, H, W, OC)

    pe_sum = jnp.sum(pe_out, axis=0)
    pe_add = saturate(pe_sum, hw.pe_add_bits)
    ovf20 = jnp.sum((pe_sum != pe_add).astype(jnp.int32))
    if corrected:
        hi = (1 << (hw.bias_bits - 1)) - 1
        fused = jnp.asarray(np.clip(qp.bias_int[i], -hi - 1, hi), jnp.int32)
    else:
        fused = jnp.asarray(qp.fused_bias(i), jnp.int32)     # (OC,)
    y = pe_add + fused
    return pe_out, pe_add, y, jnp.stack([ovf18, ovf20])


def _requant_out(y_i32, i: int, L: int, qp: QuantParams):
    """Step 6 requant wiring. Returns (y_out float32, extras dict)."""
    bits = qp.hw.quan_bits
    qmin, qmax = float(-(1 << (bits - 1))), float((1 << (bits - 1)) - 1)
    m, n = qp.requant_m[i], qp.requant_n[i]
    y = apply_requant_f32(y_i32, m, n)
    extras = {}
    if i == 0:
        extras["shortcut"] = jax.nn.relu(y)
    if i == L - 1:
        zero_L, scale_L = qp.a_zero[L], qp.a_scale[L]
        y_q = jnp.clip(jnp.round(y + jnp.float32(zero_L)), qmin, qmax)
        extras["out_int8"] = y_q
        y = (y_q - jnp.float32(zero_L)) * jnp.float32(scale_L)
    return y, extras


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5, 6, 7, 8))
def _integer_forward_impl(spec: SESRSpec, x, qp_static: QuantParams,
                          collect: bool, halo_axis=None,
                          corrected: bool = False, compute: str = "bf16",
                          residual_mode: str = "sim",
                          qat_add_bounds=None):
    L = spec.num_convs
    qp = qp_static
    if compute == "fast" and not getattr(qp, "fast_cert_ok", False):
        raise ValueError(
            "compute='fast' requires a certified QuantParams: the fast "
            "datapath skips the per-PE 18-bit saturation stage and is only "
            "exact when certify_fast() has proven saturation-freedom over a "
            "calibration set (quant/certify.py). Run certify_fast() and use "
            "the stamped artifact, or use compute='bf16' (PE-exact).")
    dumps: Dict[str, jnp.ndarray] = {}
    h = x
    shortcut = None
    overflows = []
    for i in range(L):
        if i == L - 1 and residual_mode in ("graph_add", "graph_add_qat"):
            # Upstream MFLAG 1/2 quirk: sim.py:33-41 runs the NON-sim models
            # (nr.nr()/dm.dm()), whose in-graph AddOp feeds branch+shortcut
            # into the last conv's quant function — which then loads the
            # shortcut from disk and adds it AGAIN (quan_func.py:248-252).
            # The shortcut is therefore double-counted. Replicated only for
            # oracle parity with the dm/nr goldens; deployment uses "sim".
            # "graph_add_qat": the qatf="qat_" composition additionally
            # swaps the AddOp for QuantAdd (prepare, test.py:61-63), which
            # the fx trace bakes into a fake-quant of both operands with a
            # scale FROZEN from the checkpoint's observer buffers
            # (quant/qat.py quant_add_frozen; qat_add_bounds = the
            # checkpoint's union observer min/max).
            if residual_mode == "graph_add_qat":
                from sesr_tpu.quant.qat import quant_add_frozen
                h = quant_add_frozen(h, shortcut, *qat_add_bounds,
                                     qp.hw.quan_bits)
            else:
                h = h + shortcut
        x_q, x_shift = _quantize_domain_in(h, i, L, qp, shortcut, corrected)
        pe_out, pe_add, y, ovf = _integer_conv_pe(x_shift, i, qp,
                                                  halo_axis=halo_axis,
                                                  corrected=corrected,
                                                  compute=compute)
        overflows.append(ovf)
        h, extras = _requant_out(y, i, L, qp)
        if i == 0:
            shortcut = extras["shortcut"]
        if i < L - 1:
            h = jax.nn.relu(h)
        if collect:
            dumps[f"input.{i}"] = x_q
            dumps[f"pe_out.{i}"] = pe_out
            dumps[f"pe_add.{i}"] = pe_add
            dumps[f"requant.{i}"] = h
            if i == 0:
                dumps["shortcut"] = shortcut
            if i == L - 1:
                dumps[f"input.{L}"] = extras["out_int8"]
    if collect:
        # per-layer saturation-event counts (debug-mode numeric sanitizer);
        # the 18/20-bit split matters for layer-hybrid certification: the
        # fast lowering applies the SAME 20-bit adder clamp, so only
        # 18-bit per-PE events (plus per-MAC transients, quant/strict.py)
        # disqualify a layer from it
        ovf = jnp.stack(overflows)                       # (L, 2)
        dumps["overflow_counts"] = ovf.sum(axis=1)
        dumps["overflow_18"] = ovf[:, 0]
        dumps["overflow_20"] = ovf[:, 1]
    if spec.has_pixel_shuffle:
        h = pixel_shuffle_nhwc(h, spec.scaling_factor)
    return h, dumps


def integer_forward(spec: SESRSpec, qp: QuantParams, x,
                    collect_dumps: bool = False, halo_axis=None,
                    corrected: bool = False, compute: str = "bf16",
                    residual_mode: str = "sim", qat_add_bounds=None):
    """Bit-exact integer forward. x: NHWC float in [0, 1].

    Returns (y, dumps). y is the dequantized float output (reference
    sim.py's `gfake`). With collect_dumps=True, `dumps` holds every
    intermediate the reference writes to output_pt/ (input.{i}, pe_out.{i}
    [(PE, N, H, W, OC)], pe_add.{i}, requant.{i}, shortcut, input.{L}).

    ``halo_axis``: mesh axis name for spatially-sharded execution inside
    shard_map — every conv then halo-exchanges instead of zero-padding along
    W (parallel/tiling.py); results are bit-identical to monolithic.

    ``corrected``: fix the reference datapath's 16-bit zero-correction
    truncation (see _integer_conv_pe) — the deployment-quality integer mode;
    False (default) is bit-exact with the reference RTL sim.

    ``residual_mode``: "sim" (default) performs the integer residual add the
    way the reference's *_sim models do (single add through the quant
    function); "graph_add" replicates the MFLAG 1/2 composition where the
    model's AddOp is still in the graph and the shortcut is double-counted
    (see _integer_forward_impl) — oracle-parity mode for the dm/nr goldens.
    "graph_add_qat" additionally applies the QuantAdd fake-quant with the
    frozen checkpoint scale (``qat_add_bounds`` = (union_lo, union_hi) from
    io/torch_import.py load_qat_add_bounds) — the qatf="qat_" composition.
    """
    x = jnp.asarray(x, jnp.float32)
    return _integer_forward_impl(spec, x, _hashable(qp), collect_dumps,
                                 halo_axis, corrected, compute, residual_mode,
                                 qat_add_bounds)


class _hashable:
    """Wrap QuantParams for use as a jit static argument: hashed by identity,
    so each QuantParams instance compiles once (constants are baked into the
    program — exactly what we want for an inference engine)."""

    def __init__(self, qp: QuantParams):
        self.qp = qp

    def __hash__(self):
        return id(self.qp)

    def __eq__(self, other):
        return isinstance(other, _hashable) and other.qp is self.qp

    def __getattr__(self, name):
        return getattr(self.qp, name)
