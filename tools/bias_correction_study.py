"""PTQ bias correction study — a CLOSED DOOR, recorded with numbers.

Two standard variants (cf. "Quantization for Rapid Deployment of Deep
Neural Networks", arXiv:1810.05488 — PAPERS.md) applied to the corrected
integer deployment path, scored on held-out real-pixel GT PSNR
(RealImageDataset seed 77, the observer-study protocol):

  A. empirical full-path sequential correction: per-layer, per-channel
     E[preact_quant] - E[preact_float] folded into bias_int, layers
     corrected in order with recomputation;
  B. weight-only analytic correction: (s_w*W_int - W_f) (x) E[x_float]
     — attributes only the weight-rounding error.

RESULT (round 4, 8 calibration images, 6 held-out crops per task):

  task    base      A (full-path)      B (weight-only)
  nrdm_3  24.827    23.955 (-0.873)    23.848 (-0.980)
  nr      27.598    27.528 (-0.070)    27.620 (+0.022)
  sr_x2   30.164    29.378 (-0.786)    29.838 (-0.326)
  dm      28.882    28.181 (-0.702)    28.246 (-0.636)

BOTH variants lose on 7 of 8 task-arms (the one win is +0.02 dB, noise).
Why: the reference-semantics calibration observes activations through the
weight-quantized pipeline, so the per-tensor asymmetric scales/zeros are
already adapted to the quantized network's statistics — the network-wide
mean shift bias correction targets is ALREADY absorbed, and post-hoc
per-channel corrections (max |delta| 226-21947 bias units) push the
pre-activation distributions off their calibrated windows, costing more
in range clipping than the corrected channel means recover. For these
shallow 16-channel nets the binding PTQ error is range/rounding, not
channel-mean bias. Do not re-open without per-channel weight scales (a
different hardware contract than the reference ASIC's per-tensor one).

Usage: timeout 1800 python tools/bias_correction_study.py
"""

from __future__ import annotations

import dataclasses
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from sesr_tpu.config import TASKS
from sesr_tpu.data.datasets import RealImageDataset
from sesr_tpu.io.torch_import import load_reference_checkpoint
from sesr_tpu.metrics import evaluate_pair
from sesr_tpu.ops.conv import conv2d_nhwc
from sesr_tpu.quant.integer import (_integer_conv_pe, _quantize_domain_in,
                                    _requant_out, integer_forward)
from sesr_tpu.quant.params import QuantParams
from make_qparams import calibration_images

HI16 = (1 << 15) - 1


def _float_taps(params, x):
    """(per-layer input, per-layer pre-activation) of the float net."""
    ins, pre, h, c0 = [], [], x, None
    L = params.num_convs
    for i in range(L):
        if i == L - 1:
            h = h + c0
        ins.append(h)
        y = conv2d_nhwc(h, params.weights[i], params.biases[i])
        pre.append(y)
        if i < L - 1:
            h = jax.nn.relu(y)
            if i == 0:
                c0 = h
    return ins, pre


def _quant_preacts(qp, x):
    """Per-layer post-bias conv outputs (integer conv-output units) of the
    corrected integer path (residual_mode='sim', the deployment wiring)."""
    L = qp.num_convs
    h, shortcut, pre = x, None, []
    for i in range(L):
        _xq, x_shift = _quantize_domain_in(h, i, L, qp, shortcut, True)
        _po, _pa, y, _ovf = _integer_conv_pe(x_shift, i, qp,
                                             corrected=True, compute="bf16")
        pre.append(y)
        h, extras = _requant_out(y, i, L, qp)
        if i == 0:
            shortcut = extras["shortcut"]
        if i < L - 1:
            h = jax.nn.relu(h)
    return pre


def _chan_mean(t):
    a = np.asarray(t, np.float64)
    return a.reshape(-1, a.shape[-1]).mean(0)


def correct_full_path(params, qp, images):
    qp_c = qp
    for i in range(qp.num_convs):
        acc_q = acc_f = None
        for img in images:
            x = jnp.asarray(img, jnp.float32)
            mq = _chan_mean(_quant_preacts(qp_c, x)[i])
            mf = _chan_mean(_float_taps(params, x)[1][i]) \
                / (qp.a_scale[i] * qp.w_scale[i])
            acc_q = mq if acc_q is None else acc_q + mq
            acc_f = mf if acc_f is None else acc_f + mf
        d = np.round((acc_q - acc_f) / len(images)).astype(np.int64)
        bias = list(qp_c.bias_int)
        bias[i] = np.clip(bias[i] - d, -HI16 - 1, HI16).astype(np.int32)
        qp_c = dataclasses.replace(qp_c, bias_int=bias)
    return qp_c


def correct_weight_only(params, qp, images):
    L = qp.num_convs
    mean_in = [None] * L
    for img in images:
        ins, _ = _float_taps(params, jnp.asarray(img, jnp.float32))
        for i, t in enumerate(ins):
            m = _chan_mean(t)
            mean_in[i] = m if mean_in[i] is None else mean_in[i] + m
    bias = list(qp.bias_int)
    for i in range(L):
        w_err = qp.w_scale[i] * np.asarray(qp.w_int[i], np.float64) \
            - np.asarray(params.weights[i], np.float64)          # HWIO
        delta_f = np.einsum("hwio,i->o", w_err, mean_in[i] / len(images))
        d = np.round(delta_f / (qp.a_scale[i] * qp.w_scale[i])).astype(np.int64)
        bias[i] = np.clip(bias[i] - d, -HI16 - 1, HI16).astype(np.int32)
    return dataclasses.replace(qp, bias_int=bias)


def score(spec, qp, data, task):
    ps = []
    for inp, gt, *_ in data:
        y, _ = integer_forward(spec, qp, jnp.asarray(inp), corrected=True)
        ps.append(evaluate_pair(task, np.asarray(y)[0], gt[0], inp[0])[0])
    return float(np.mean(ps))


def main():
    for task in ("nrdm_3", "nr", "sr_x2", "dm"):
        spec = TASKS[task]
        params = load_reference_checkpoint(task)
        qp = QuantParams.load(
            os.path.join(REPO, "artifacts", f"qparams_{task}.npz"))
        calib = calibration_images(task, 8, None, 4)
        eval_data = list(RealImageDataset(task, n=6, hw=(96, 128), seed=77))
        base = score(spec, qp, eval_data, task)
        a = score(spec, correct_full_path(params, qp, calib), eval_data, task)
        b = score(spec, correct_weight_only(params, qp, calib), eval_data,
                  task)
        print(f"{task}: base {base:.4f}  full-path {a:.4f} ({a-base:+.4f})  "
              f"weight-only {b:.4f} ({b-base:+.4f})")


if __name__ == "__main__":
    main()
