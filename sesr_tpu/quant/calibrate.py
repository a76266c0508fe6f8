"""Calibration + fake-quant interpreter (the reference's `test.py` path,
exe_mode=0).

The reference instruments a torch.fx graph so that every conv is preceded by
a dynamic per-image fake-quant whose observer state lives in files on disk,
re-loaded and re-saved on every layer of every image
(quan_func.py:175-215, 181-196). Here the same numerics are a pure function:
one jitted forward returns the output AND the per-domain min/max of this
image; the caller folds min/max across the calibration set (a single
device->host transfer at the very end).

Faithfulness notes (all verified against the reference source):
- activation quantization during calibration/eval is DYNAMIC: each image is
  quantized with its own min/max, while the running min/max only feeds the
  final static scales (quan_func.py:177-215).
- weights are fake-quantized once: w_int * w_scale (quan_func.py:113-114).
- the float path models the PE accumulator/adder saturation as float clamps
  at (+-2^(bits-1) - zero) * s_a * s_w (quan_func.py:330-333, 431-434); with
  `exact_pe=True` the conv is split into the 4 per-PE partial convs exactly
  like the hardware, with per-PE clamping before the 20-bit-equivalent clamp.
- bias is added in quantized-dequantized form at scale s_a*s_w
  (quan_func.py:391-416, 457-459).
- the output domain L is observed on the post-bias output of the last conv;
  its fake-quant is applied only for nets with a PixelShuffle, mirroring the
  insert-before-PixelShuffle graph pass (test.py:90-91) vs. the MFLAG==3
  observer-only branch (quan_func.py:460-479).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
from jax import lax
import jax.numpy as jnp
import numpy as np

from sesr_tpu.config import SESRSpec, HardwareConfig, DEFAULT_HW
from sesr_tpu.models.sesr import CollapsedParams
from sesr_tpu.ops.conv import conv2d_nhwc, pixel_shuffle_nhwc
from sesr_tpu.quant.params import (
    CalibState, QuantParams, quantize_weights, finalize,
)


def _dynamic_fake_quant(x, bits: int, axes=None):
    """Per-tensor dynamic asymmetric fake-quant. Returns (x_fq, lo, hi,
    scale, zero) — scale/zero are traced f32 scalars used by the PE clamps.

    `axes`: mesh axis names for spatially/batch-sharded calibration inside
    shard_map — the min/max then reduce over the whole mesh (pmin/pmax over
    ICI), making the dynamic quantization bit-identical to monolithic."""
    qmax = float(2 ** (bits - 1) - 1)
    qmin = float(-(2 ** (bits - 1)))
    lo = jnp.min(x)
    hi = jnp.max(x)
    if axes is not None:
        lo = jax.lax.pmin(lo, axes)
        hi = jax.lax.pmax(hi, axes)
    # degenerate all-equal domain: the reference asserts "Input tensor is all
    # equal" (quan_func.py:196); inside jit we cannot raise on a traced value,
    # so floor the scale at a denormal-safe epsilon — the quantized tensor is
    # then exactly constant instead of NaN, and finalize() (host-side, eager)
    # still surfaces the degenerate range to the caller.
    scale = jnp.maximum((hi - lo) / (qmax - qmin), jnp.float32(1e-30))
    zero = qmin - jnp.round(lo / scale)
    q = jnp.clip(jnp.round(x / scale + zero), qmin, qmax)
    return (q - zero) * scale, lo, hi, scale, zero


def _pe_partial_weights(w_hwio, pe: int):
    """Split a HWIO kernel into `pe` kernels keeping input channels c with
    c % pe == p (others zeroed) — the channel round-robin PE decomposition
    (quan_func.py:298-318, applied to weights instead of inputs; the two are
    equivalent because convolution is linear in its input). The rule itself
    is single-sourced in quant/integer.py pe_channel_mask (w may be a jnp
    tracer here, so the numpy _pe_weight_masks cannot be reused whole)."""
    from sesr_tpu.quant.integer import pe_channel_mask
    ic = w_hwio.shape[2]
    outs = []
    for p in range(pe):
        mask = pe_channel_mask(ic, pe, p).astype(np.float32)
        outs.append(w_hwio * mask[None, None, :, None])
    return outs


def _fq_conv_layer(x_fq, w_fq, bias_f, scale, zero, w_scale: float,
                   hw: HardwareConfig, exact_pe: bool, w_valid: bool = False):
    """One conv in the fake-quant pipeline: PE-split conv with float
    saturation clamps + quantized bias."""
    acc_hi = float(2 ** (hw.pe_acc_bits - 1) - 1)
    acc_lo = float(-(2 ** (hw.pe_acc_bits - 1)))
    add_hi = float(2 ** (hw.pe_add_bits - 1) - 1)
    add_lo = float(-(2 ** (hw.pe_add_bits - 1)))
    s_eff = scale * jnp.float32(w_scale)

    if exact_pe:
        parts = []
        for w_p in _pe_partial_weights(w_fq, hw.pe):
            y_p = conv2d_nhwc(x_fq, w_p, w_valid=w_valid,
                              precision=lax.Precision.HIGHEST)
            y_p = jnp.clip(y_p, (acc_lo - zero) * s_eff, (acc_hi - zero) * s_eff)
            parts.append(y_p)
        y = parts[0]
        for y_p in parts[1:]:
            y = y + y_p
    else:
        y = conv2d_nhwc(x_fq, w_fq, w_valid=w_valid,
                        precision=lax.Precision.HIGHEST)
    y = jnp.clip(y, (add_lo - zero) * s_eff, (add_hi - zero) * s_eff)

    # quantize-dequantize bias at scale s_a * s_w (quan_func.py:391-416)
    b_hi = float(2 ** (hw.bias_bits - 1) - 1)
    b_lo = float(-(2 ** (hw.bias_bits - 1)))
    b_q = jnp.clip(jnp.round(bias_f / s_eff), b_lo, b_hi) * s_eff
    return y + b_q


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 6, 7, 8))
def _calibration_forward_impl(spec: SESRSpec, fq_weights, x,
                              hw: HardwareConfig, exact_pe: bool,
                              hist_bounds=None, collect_hist: bool = False,
                              axes=None, qat_add_bounds=None):
    w_fq, w_scales, biases = fq_weights
    L = spec.num_convs
    lows, highs, hists = [], [], []

    def observe(h, d):
        lo, hi = jnp.min(h), jnp.max(h)
        if axes is not None:
            lo = jax.lax.pmin(lo, axes)
            hi = jax.lax.pmax(hi, axes)
        lows.append(lo)
        highs.append(hi)
        if collect_hist:
            from sesr_tpu.quant.observers import histogram_on_device
            hist = histogram_on_device(h, hist_bounds[d, 0], hist_bounds[d, 1])
            if axes is not None:
                hist = jax.lax.psum(hist, axes)
            hists.append(hist)

    h = x
    c0 = None
    for i in range(L):
        if i == L - 1:
            if qat_add_bounds is not None:
                # qatf="qat_" composition: the model's AddOp was swapped
                # for QuantAdd (prepare, test.py:61-63), which fx bakes
                # into a fake-quant with a scale FROZEN from the
                # checkpoint's observer buffers (quant/qat.py
                # quant_add_frozen)
                from sesr_tpu.quant.qat import quant_add_frozen
                h = quant_add_frozen(h, c0, *qat_add_bounds, hw.quan_bits)
            else:
                h = h + c0                              # outer residual add
        observe(h, i)
        h_fq, _, _, scale, zero = _dynamic_fake_quant(h, hw.quan_bits, axes)
        if axes is not None:
            from sesr_tpu.ops.halo import halo_exchange_w
            sp = axes[-1]
            h_fq = halo_exchange_w(h_fq, w_fq[i].shape[0] // 2, sp)
        h = _fq_conv_layer(h_fq, w_fq[i], biases[i], scale, zero,
                           w_scales[i], hw, exact_pe, w_valid=axes is not None)
        if i == 0:
            h = jax.nn.relu(h)
            c0 = h
        elif i < L - 1:
            h = jax.nn.relu(h)
    # output domain L: observe post-bias last-conv output
    observe(h, L)
    if spec.has_pixel_shuffle:
        h, _, _, _, _ = _dynamic_fake_quant(h, hw.quan_bits, axes)
        h = pixel_shuffle_nhwc(h, spec.scaling_factor)
    minmax = jnp.stack([jnp.stack(lows), jnp.stack(highs)], axis=0)  # (2, L+1)
    if collect_hist:
        return h, minmax, jnp.stack(hists)              # (L+1, BINS)
    return h, minmax


def _prep_fq_weights(params: CollapsedParams, hw: HardwareConfig,
                     w_int_override=None):
    """w_int_override: per-layer int-valued arrays replacing the default
    round-to-nearest quantization AT THE SAME per-tensor scales — the hook
    for adaptive weight rounding (quant/adaround.py). The scales stay the
    reference contract (quan_func.py:44-126); only the rounding choice of
    each weight may differ."""
    w_int, w_scale = quantize_weights([np.asarray(w) for w in params.weights], hw)
    if w_int_override is not None:
        w_int = [np.asarray(q, np.int32) for q in w_int_override]
        lim = 1 << (hw.quan_bits - 1)
        assert all((q >= -lim).all() and (q < lim).all() for q in w_int)
    w_fq = tuple(jnp.asarray(q.astype(np.float32) * np.float32(s))
                 for q, s in zip(w_int, w_scale))
    biases = tuple(jnp.asarray(b, jnp.float32) for b in params.biases)
    return (w_fq, tuple(w_scale), biases), w_int, w_scale


def calibration_forward(spec: SESRSpec, params: CollapsedParams, x,
                        hw: HardwareConfig = DEFAULT_HW, exact_pe: bool = True,
                        qat_add_bounds=None):
    """Single-image fake-quant forward. Returns (y, minmax[(2, L+1)]).
    qat_add_bounds: (union_lo, union_hi) for the qatf="qat_" composition's
    frozen QuantAdd at the outer residual (quant/qat.py quant_add_frozen;
    io/torch_import.py load_qat_add_bounds)."""
    fq_weights, _, _ = _prep_fq_weights(params, hw)
    return _calibration_forward_impl(spec, fq_weights, x, hw, exact_pe,
                                     None, False, None, qat_add_bounds)


def fake_quant_forward(spec: SESRSpec, params: CollapsedParams, x,
                       hw: HardwareConfig = DEFAULT_HW, exact_pe: bool = True):
    """Fake-quant forward only (the PSNR-eval path of test.py:141-183)."""
    y, _ = calibration_forward(spec, params, x, hw, exact_pe)
    return y


class ObserverRegressionWarning(UserWarning):
    """The chosen calibration observer measurably degrades the deployment
    integer path vs plain minmax (> 1 dB ground-truth PSNR). Fired by
    guarded_calibrate — the productized lesson of the round-3 observer
    ablation (BASELINE.md): KL gains ~0.5 dB on the SR tasks but silently
    clips the sparse Bayer ranges of the raw-domain tasks by ~12 dB, the
    likely reason the reference's author abandoned it (define.py:16-20)."""


def quantization_fidelity_psnr(spec: SESRSpec, params: CollapsedParams,
                               qp: QuantParams,
                               images: Sequence[np.ndarray]) -> float:
    """Mean PSNR (dB) of the corrected integer deployment output against
    the FP32 forward over `images` — how far the quantization strays from
    the float model (no ground truth needed). NOT the observer-guard
    metric: KL deliberately clips outliers, so it can LOSE FP32 fidelity
    by several dB while GAINING ground-truth PSNR (measured round 4 on
    sr_x2/sr_x4: −2.0/−9.3 dB fidelity, +0.7/+0.3 dB GT PSNR) — the guard
    must score against ground truth (guarded_calibrate)."""
    from sesr_tpu.models.sesr import forward_float
    from sesr_tpu.quant.integer import integer_forward

    tot = 0.0
    for img in images:
        x = jnp.asarray(img, jnp.float32)
        y_f = np.asarray(forward_float(spec, params, x))
        y_i = np.asarray(integer_forward(spec, qp, x, corrected=True)[0])
        mse = float(np.mean((y_f - y_i) ** 2))
        tot += -10.0 * float(np.log10(max(mse, 1e-12)))
    return tot / max(len(images), 1)


def guarded_calibrate(spec: SESRSpec, params: CollapsedParams, data,
                      task: str, observer: str = "minmax",
                      threshold_db: float = 1.0, **calibrate_kwargs):
    """calibrate() with the observer guardrail (round-3 verdict item 8):
    for a non-minmax observer, ALSO calibrate plain minmax, score both
    artifacts through the corrected integer deployment path against
    ground truth (the round-3 ablation's own protocol, metrics.
    evaluate_pair), and fire ObserverRegressionWarning when the chosen
    observer loses more than ``threshold_db``. Guards the KL foot-gun —
    the ablation measured −12 dB on raw-domain tasks, silently.

    ``data``: (inp, gt[, ...]) pairs. Returns the chosen-observer
    QuantParams either way; callers decide whether the warning aborts
    (the CLI requires --force)."""
    import warnings
    from sesr_tpu.metrics import evaluate_pair
    from sesr_tpu.quant.integer import integer_forward

    images = [d[0] for d in data]
    qp = calibrate(spec, params, images, observer=observer,
                   **calibrate_kwargs)
    if observer == "minmax" or not data:
        return qp
    qp_mm = calibrate(spec, params, images, observer="minmax",
                      **calibrate_kwargs)

    def score(q):
        tot = 0.0
        for inp, gt, *_ in data:
            y = np.asarray(integer_forward(spec, q, jnp.asarray(inp),
                                           corrected=True)[0])
            p, _ = evaluate_pair(task, y[0], gt[0], inp[0])
            tot += p
        return tot / len(data)

    p_obs, p_mm = score(qp), score(qp_mm)
    if p_obs < p_mm - threshold_db:
        warnings.warn(
            f"observer '{observer}' degrades the integer deployment path "
            f"by {p_mm - p_obs:.2f} dB vs minmax on this calibration set "
            f"({p_obs:.2f} vs {p_mm:.2f} dB PSNR against ground truth) — "
            f"KL is known to clip sparse raw-domain ranges "
            f"catastrophically (BASELINE.md observer ablation); use "
            f"minmax/percentile for this task, or keep it deliberately "
            f"(CLI: --force)", ObserverRegressionWarning, stacklevel=2)
    return qp


def calibrate(spec: SESRSpec, params: CollapsedParams,
              images: Sequence[np.ndarray],
              hw: HardwareConfig = DEFAULT_HW,
              exact_pe: bool = True,
              force_output_min_zero: bool = True,
              observer: str = "minmax",
              percentile: float = 0.9999,
              safe_zero_floor: bool = False,
              qat_add_bounds=None,
              w_int_override=None) -> QuantParams:
    """Run the calibration set through the fake-quant pipeline and finalize
    a complete QuantParams (test.py eval loop + :186-217 finalize).

    observer: "minmax" (the reference's live strategy), "percentile", or
    "kl" (KL-entropy — the strategy the reference abandoned, define.py:16-20;
    see quant/observers.py). Histogram observers take a second pass that
    accumulates per-domain 2048-bin histograms on device.

    qat_add_bounds: (union_lo, union_hi) to replicate the qatf="qat_"
    composition's frozen QuantAdd at the outer residual add (see
    quant/qat.py quant_add_frozen).

    Observer guardrail: see guarded_calibrate — the ground-truth-scored
    comparison against minmax that the CLI runs for non-default observers.

    w_int_override: per-layer int weight arrays replacing round-to-nearest
    at the same per-tensor scales (adaptive rounding, quant/adaround.py —
    shipped for sr_x4 where it gains +0.17..0.18 dB held-out GT PSNR;
    tools/adaround_study.py).
    """
    fq_weights, w_int, w_scale = _prep_fq_weights(params, hw, w_int_override)
    L = spec.num_convs

    def fwd(img, hist_bounds=None, collect_hist=False):
        # single call site for BOTH passes so the min/max pass and the
        # histogram pass always run the identical composition (a histogram
        # taken over a different forward than the one that produced its
        # bounds would silently skew KL/percentile scales for the qatf
        # composition)
        return _calibration_forward_impl(
            spec, fq_weights, jnp.asarray(img, jnp.float32), hw, exact_pe,
            hist_bounds, collect_hist, None, qat_add_bounds)

    calib = CalibState.fresh(L + 1)
    for img in images:
        _, minmax = fwd(img)
        mm = np.asarray(minmax, np.float64)
        for d in range(L + 1):
            calib.update(d, mm[0, d], mm[1, d])

    if observer != "minmax":
        from sesr_tpu.quant.observers import (
            BINS_NUM, percentile_bounds, kl_bounds)
        bounds = jnp.asarray(
            np.stack([calib.min_vals, calib.max_vals], axis=1), jnp.float32)
        total = np.zeros((L + 1, BINS_NUM), np.int64)
        for img in images:
            _, _, hists = fwd(img, bounds, True)
            total += np.asarray(hists, np.int64)
        for d in range(L + 1):
            lo, hi = calib.min_vals[d], calib.max_vals[d]
            if observer == "percentile":
                new_lo, new_hi = percentile_bounds(total[d], lo, hi, percentile)
            elif observer == "kl":
                new_lo, new_hi = kl_bounds(total[d], lo, hi)
            else:
                raise ValueError(f"unknown observer {observer!r}")
            calib.min_vals[d], calib.max_vals[d] = new_lo, new_hi

    return finalize(spec, w_int, w_scale,
                    [np.asarray(b) for b in params.biases], calib, hw,
                    force_output_min_zero=force_output_min_zero,
                    safe_zero_floor=safe_zero_floor)
