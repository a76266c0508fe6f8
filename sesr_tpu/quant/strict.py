"""Strict per-MAC-saturating convolution — the hardware ground-truth spec.

The reference contains a second, stricter model of the ASIC accumulator:
`conv_forward_naive` (myQL/quan_modules.py:43-99) clamps the running sum to
PE_ACC_BIT after EVERY single multiply-accumulate, in a fixed scan order
(input channel, then kernel row, then kernel column — :87-93). The fast path
(quan_func.py) clamps only once per PE after the full partial sum; the two
agree unless an intermediate sum saturates transiently.

This module is that strict model as an executable spec: a lax.scan over taps
in the reference's exact order with per-step saturation. It exists to
adjudicate kernels when transient saturation matters (SURVEY §4.3) and is
validated against the reference implementation itself in
tests/test_strict.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sesr_tpu.config import HardwareConfig, DEFAULT_HW
from sesr_tpu.ops.fixedpoint import saturate


def conv_per_mac_saturating(x_nhwc, w_hwio, acc_bits: int = 18):
    """Stride-1 SAME conv where the accumulator saturates after every MAC.

    Scan order matches quan_modules.py:87-93: for each output position, taps
    are accumulated input-channel-major, then kernel-row, then kernel-column,
    clamping to +-2^(acc_bits-1) after each addition. Implemented as a
    lax.scan over the k*k*C taps with shifted full-image slices, so the
    per-position Python loops of the reference become one vectorized scan.
    """
    x = jnp.asarray(x_nhwc, jnp.int32)
    w = np.asarray(w_hwio)
    k = w.shape[0]
    ic, oc = w.shape[2], w.shape[3]
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    n, h, wdt, _ = x.shape

    # tap order: kc (input channel) outermost, then kh, then kw
    # (quan_modules.py:88-90)
    taps = [(kc, kh, kw) for kc in range(ic) for kh in range(k) for kw in range(k)]
    shifted = jnp.stack([
        lax.slice(xp, (0, kh, kw, kc), (n, kh + h, kw + wdt, kc + 1))[..., 0]
        for (kc, kh, kw) in taps])                       # (T, N, H, W)
    weights = jnp.asarray(
        np.stack([w[kh, kw, kc, :] for (kc, kh, kw) in taps]), jnp.int32)  # (T, OC)

    def step(acc, tap):
        xs, ws = tap                                     # (N,H,W), (OC,)
        acc = acc + xs[..., None] * ws
        return saturate(acc, acc_bits), None

    init = jnp.zeros((n, h, wdt, oc), jnp.int32)
    acc, _ = lax.scan(step, init, (shifted, weights))
    return acc


def strict_integer_forward(spec, qp, x, residual_mode: str = "sim",
                           qat_add_bounds=None):
    """Whole-network strict integer forward — the generalized port of the
    reference's hand-unrolled `sesr_forward_sim` (quan_modules.py:101-201).

    Per conv i, exactly as the reference composes it:
      1. domain-in quantization (quantize_asymmetrical_by_tensor, exe_mode=1)
         — shared with the fast interpreter (quant/integer.py), it is
         bit-exact against the goldens at this stage;
      2. PE-split conv via `conv_forward_naive`'s per-MAC-saturating
         accumulator in the reference tap order (quan_modules.py:81-95).
         The reference masks input channels c % 4 != p to zero per PE
         (reshape_input_for_hardware_pe); masking the WEIGHTS instead gives
         the identical per-MAC trajectory (a zero operand contributes an
         exact 0 to an already-clamped accumulator either way);
      3. per-PE zero restoration + 18-bit clamp
         (reshape_ouput_for_hardware_pe, quan_func.py:336-370) — note the
         restoration lands on the ALREADY per-MAC-clamped partial sum and
         clamps again, exactly as the reference layers the two functions;
      4. 4-PE sum clamped to 20 bits + fused bias (PEs_and_bias_adder);
      5. requant wiring + ReLU (requan_conv2d_output; the trailing
         F.relu(output_4) of the reference is a no-op because the output
         domain forces min=0).

    Validated bit-exactly against the reference's own sesr_forward_sim run
    (tests/test_strict.py::test_whole_net_strict_vs_reference). This is the
    strictest executable model of the ASIC in the repo and the adjudicator
    for kernels whenever transient per-MAC saturation matters; where no
    accumulator saturates (calibration-certified), it agrees exactly with
    the fast interpreter — asserted per task in
    tests/test_strict.py::test_whole_net_strict_matches_fast.
    """
    import jax.numpy as jnp
    from sesr_tpu.quant.integer import (_quantize_domain_in, _requant_out,
                                        _pe_weight_masks)
    from sesr_tpu.ops.conv import pixel_shuffle_nhwc

    hw = qp.hw
    L = spec.num_convs
    x = jnp.asarray(x, jnp.float32)
    h = x
    shortcut = None
    for i in range(L):
        if i == L - 1 and residual_mode in ("graph_add", "graph_add_qat"):
            if residual_mode == "graph_add_qat":
                from sesr_tpu.quant.qat import quant_add_frozen
                h = quant_add_frozen(h, shortcut, *qat_add_bounds,
                                     hw.quan_bits)
            else:
                h = h + shortcut
        x_q, x_shift = _quantize_domain_in(h, i, L, qp, shortcut)
        x_i32 = x_shift.astype(jnp.int32)
        zero_eff = qp.effective_zero(i)
        total = None
        for p, w_p in enumerate(_pe_weight_masks(np.asarray(qp.w_int[i]), hw.pe)):
            y_p = conv_per_mac_saturating(x_i32, w_p, hw.pe_acc_bits)
            zsum = jnp.asarray(w_p.sum(axis=(0, 1, 2)) * zero_eff, jnp.int32)
            y_p = saturate(y_p + zsum, hw.pe_acc_bits)
            total = y_p if total is None else total + y_p
        pe_add = saturate(total, hw.pe_add_bits)
        y = pe_add + jnp.asarray(qp.fused_bias(i), jnp.int32)
        h, extras = _requant_out(y.astype(jnp.float32), i, L, qp)
        if i == 0:
            shortcut = extras["shortcut"]
        if i < L - 1:
            h = jax.nn.relu(h)
    if spec.has_pixel_shuffle:
        h = pixel_shuffle_nhwc(h, spec.scaling_factor)
    return h


def strict_vs_fast_divergence(x_nhwc, w_hwio, hw: HardwareConfig = DEFAULT_HW):
    """Count positions where the per-MAC-saturating model disagrees with the
    clamp-once-at-the-end model — a calibration-time check that transient
    saturation is absent (in which case the fast kernels are exact against
    the strictest hardware model too)."""
    from sesr_tpu.ops.conv import conv2d_nhwc

    strict = conv_per_mac_saturating(x_nhwc, w_hwio, hw.pe_acc_bits)
    fast = saturate(conv2d_nhwc(jnp.asarray(x_nhwc, jnp.int32),
                                jnp.asarray(w_hwio, jnp.int32),
                                preferred_element_type=jnp.int32),
                    hw.pe_acc_bits)
    return int(jnp.sum(strict != fast))
