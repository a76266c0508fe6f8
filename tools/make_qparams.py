"""Calibrate every task's reference checkpoint and save QuantParams
artifacts to artifacts/qparams_{task}.npz.

These artifacts are the product analog of the reference's output_pt/ tree
(scales, zeros, int weights, requant constants) — produced once, shipped
with the repo, loaded by __graft_entry__.py and bench.py without needing a
calibration pass (or any device->host traffic) at load time.

Calibration set: the task-appropriate synthetic natural-image pipeline
(data/datasets.py SyntheticDataset — smooth images through the Bayer
mosaic + shot/read-noise model for nr/dm/nrdm, bicubic-ish downscale for
SR), mirroring the reference's calibration contract (test.py:141-199: the
real test set flows through the observers). The reference's own datasets
are absolute paths on its author's machine (self_dataset.py:108,212) and
do not ship; pass --images DIR with .npy NHWC files to calibrate on real
data instead. Uniform-noise calibration (round 1) is gone: activation
ranges from rng.random() are not representative of images.

Deployment-quality switches: safe_zero_floor=True re-anchors any domain
whose zero would fall below -128 (quant/params.py finalize), and every
artifact is fast-mode certified (quant/certify.py) over its calibration
set before shipping; compute="fast" refuses an uncertified artifact.

Run on CPU: python tools/make_qparams.py
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from sesr_tpu.config import TASKS  # noqa: E402
from sesr_tpu.data.datasets import (SyntheticDataset,  # noqa: E402
                                    RealImageDataset)
from sesr_tpu.io.torch_import import load_reference_checkpoint  # noqa: E402
from sesr_tpu.quant.calibrate import calibrate  # noqa: E402
from sesr_tpu.quant.certify import certify_fast  # noqa: E402


def calibration_images(task: str, n: int, images_dir=None, n_real: int = 4):
    """NHWC float32 calibration inputs for `task` (model-input domain):
    the synthetic natural-image pipeline plus real-photo crops
    (data/datasets.py builtin_real_images) through the same task
    degradation — so the shipped activation ranges have seen real pixel
    statistics, not only procedural ones."""
    if images_dir:
        return [np.load(f) for f in sorted(glob.glob(f"{images_dir}/*.npy"))]
    imgs = [inp for inp, _gt in SyntheticDataset(task, n=n, hw=(96, 128))]
    if n_real:
        try:
            imgs += [inp for inp, _gt in
                     RealImageDataset(task, n=n_real, hw=(96, 128))]
        except FileNotFoundError:
            print(f"[make_qparams] {task}: no builtin real images; "
                  "calibrating on synthetic only")
    return imgs


# per-task observer winners on held-out real-pixel crops
# (tools/observer_study.py, seed-77 eval; table in BASELINE.md)
OBSERVER_DEFAULTS = {"sr_x2": "kl", "sr_x4": "kl"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tasks", nargs="*", default=sorted(TASKS))
    ap.add_argument("--images", default=None,
                    help="dir of .npy NHWC calibration images "
                         "(else the synthetic natural-image pipeline)")
    ap.add_argument("--n-images", type=int, default=8)
    ap.add_argument("--n-real", type=int, default=4,
                    help="real-photo crops appended to the calibration set")
    ap.add_argument("--observer", default=None,
                    choices=("minmax", "percentile", "kl"),
                    help="activation-range observer (quant/observers.py); "
                         "default = the per-task winner of the held-out "
                         "real-pixel ablation (tools/observer_study.py): "
                         "KL for the SR tasks (+0.12/+0.27 dB over minmax "
                         "on sr_x4/sr_x2), minmax for the raw-domain tasks "
                         "(KL clips the sparse Bayer activation ranges "
                         "catastrophically, -13 dB; percentile is within "
                         "noise of minmax everywhere)")
    ap.add_argument("--out-dir", default=os.path.join(REPO, "artifacts"))
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    for task in args.tasks:
        spec = TASKS[task]
        params = load_reference_checkpoint(task)
        images = calibration_images(task, args.n_images, args.images,
                                    args.n_real)
        observer = args.observer or OBSERVER_DEFAULTS.get(task, "minmax")
        qp = calibrate(spec, params, images, safe_zero_floor=True,
                       observer=observer)
        qp = certify_fast(spec, qp, images)
        out = os.path.join(args.out_dir, f"qparams_{task}.npz")
        qp.save(out)
        print(f"[make_qparams] {task}: {out} "
              f"({os.path.getsize(out)/1e3:.0f} kB, "
              f"grade={qp.cert_grade} layers={qp.cert_stamps} "
              f"over {qp.fast_cert_images} images)")


if __name__ == "__main__":
    main()
