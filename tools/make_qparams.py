"""Calibrate every task's reference checkpoint and save QuantParams
artifacts to artifacts/qparams_{task}.npz.

These artifacts are the product analog of the reference's output_pt/ tree
(scales, zeros, int weights, requant constants) — produced once, shipped
with the repo, loaded by __graft_entry__.py and bench.py without needing a
calibration pass (or any device->host traffic) at load time.

Calibration set: fixed-seed synthetic images in [0,1] (the reference's
datasets are absolute paths on the author's machine, self_dataset.py:108,212,
and are not available; PSNR-accurate calibration on real data is a plug-in
replacement — pass --images DIR with .npy files).

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
from sesr_tpu.io.torch_import import load_reference_checkpoint  # noqa: E402
from sesr_tpu.quant.calibrate import calibrate  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tasks", nargs="*", default=sorted(TASKS))
    ap.add_argument("--images", default=None,
                    help="dir of .npy NHWC calibration images (else synthetic)")
    ap.add_argument("--n-synthetic", type=int, default=4)
    ap.add_argument("--out-dir", default=os.path.join(REPO, "artifacts"))
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    for task in args.tasks:
        spec = TASKS[task]
        params = load_reference_checkpoint(task)
        if args.images:
            images = [np.load(f) for f in sorted(glob.glob(f"{args.images}/*.npy"))]
        else:
            rng = np.random.default_rng(2024)
            images = [rng.random((1, 64, 96, spec.in_channels), dtype=np.float32)
                      for _ in range(args.n_synthetic)]
        qp = calibrate(spec, params, images)
        out = os.path.join(args.out_dir, f"qparams_{task}.npz")
        qp.save(out)
        print(f"[make_qparams] {task}: {out} ({os.path.getsize(out)/1e3:.0f} kB)")


if __name__ == "__main__":
    main()
