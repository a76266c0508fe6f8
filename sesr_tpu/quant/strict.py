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
