"""AdaRound study — per-task value measurement; sr_x4 SHIPPED, rest closed.

The bias-correction study (tools/bias_correction_study.py, round 4) closed
with: "for these shallow per-tensor-quantized nets the binding PTQ error is
range/ROUNDING, not channel-mean bias". This study attacks the rounding
half with the standard technique (AdaRound, arXiv:2004.10568), implemented
in sesr_tpu/quant/adaround.py (see its docstring for the adaptation to
this framework's contract: same per-tensor scales, integer-unit objective
on the quantized pipeline's own inputs, sequential layers, per-layer
accept-if-better guard, full recalibration afterwards).

Scoring: the repo's established PTQ-study protocol — 8 synthetic + 4 real
calibration images (tools/make_qparams.py), held-out RealImageDataset
seed-77 crops, GT PSNR through the corrected integer deployment path.

RESULTS (round 5; dB vs the shipped nearest-rounding artifacts):

  run 1 (no accept guard)        frozen-scales    recalibrated
    nrdm_3                         +0.004           -0.031
    nr                             +0.014           +0.010
    sr_x2                          -0.041           -0.040
    dm                             -0.050           -0.099
    sr_x4                          +0.165           +0.175
  run 2 (accept-if-better guard, independent optimizer run)
    nrdm_3                         -0.007           -0.077
    nr                             -0.014           -0.018
    sr_x2                          -0.041           -0.040
    dm                             +0.024           +0.023
    sr_x4                          +0.167           +0.181

CONCLUSION: the sr_x4 gain REPLICATES across two independent runs and
both arms (+0.17..0.18 dB) — shipped as the default sr_x4 recipe
(tools/make_qparams.py WEIGHT_ROUNDING_DEFAULTS). On the four small-gap
tasks the calibration-set layerwise MSE reduction does not transfer to
held-out GT (12-image fit on 16-channel nets overfits; per-layer
calibration MSE drops 0.56-0.97x yet held-out PSNR is flat-to-negative)
— they keep round-to-nearest. Door closed for blanket application; the
per-task default table is the product, mirroring the observer policy.

Usage: timeout 7200 python tools/adaround_study.py [--tasks ...]
"""

from __future__ import annotations

import argparse
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
from sesr_tpu.quant.adaround import adaround_weights
from sesr_tpu.quant.calibrate import calibrate
from sesr_tpu.quant.certify import certify_fast
from sesr_tpu.quant.integer import integer_forward
from sesr_tpu.quant.params import QuantParams
from make_qparams import calibration_images, OBSERVER_DEFAULTS


def score(spec, qp, data, task):
    ps = []
    for inp, gt, *_ in data:
        y, _ = integer_forward(spec, qp, jnp.asarray(inp), corrected=True)
        ps.append(evaluate_pair(task, np.asarray(y)[0], gt[0], inp[0])[0])
    return float(np.mean(ps))


def run_task(task, steps=800):
    spec = TASKS[task]
    params = load_reference_checkpoint(task)
    qp = QuantParams.load(os.path.join(REPO, "artifacts",
                                       f"qparams_{task}.npz"))
    calib = calibration_images(task, 8, None, 4)
    eval_data = list(RealImageDataset(task, n=6, hw=(96, 128), seed=77))
    base = score(spec, qp, eval_data, task)

    w_new = adaround_weights(spec, params, qp, calib, steps=steps,
                             verbose=True)
    # arm 1: rounding only, frozen scales (pure rounding effect)
    frozen = score(spec, dataclasses.replace(qp, w_int=list(w_new)),
                   eval_data, task)
    # arm 2: full recalibration + recertification (the shippable artifact)
    observer = OBSERVER_DEFAULTS.get(task, "minmax")
    qp_re = calibrate(spec, params, calib, safe_zero_floor=True,
                      observer=observer, w_int_override=w_new)
    qp_re = certify_fast(spec, qp_re, calib)
    recal = score(spec, qp_re, eval_data, task)
    print(f"{task}: base {base:.4f}  adaround-frozen {frozen:.4f} "
          f"({frozen-base:+.4f})  adaround-recal {recal:.4f} "
          f"({recal-base:+.4f})  [observer={observer}, "
          f"grade {qp.cert_grade}->{qp_re.cert_grade}]", flush=True)
    return base, frozen, recal


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tasks", nargs="*",
                    default=["nrdm_3", "nr", "sr_x2", "dm", "sr_x4"])
    ap.add_argument("--steps", type=int, default=800)
    args = ap.parse_args()
    for task in args.tasks:
        run_task(task, steps=args.steps)


if __name__ == "__main__":
    main()
