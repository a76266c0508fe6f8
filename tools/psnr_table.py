"""PSNR/SSIM table: FP32 vs fake-quant INT8 vs bit-exact integer sim, per
task — the reference's acceptance criterion is "quantized PSNR ~= float
PSNR" (SURVEY §4.1), measured here on a fixed synthetic evaluation set
(the reference's datasets are absolute paths on its author's machine and do
not ship; pass --data for real Set5/Set14/DIV2K-RAW directories).

Usage: python tools/psnr_table.py [--tasks ...] [--n 6]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sesr_tpu.config import TASKS  # noqa: E402
from sesr_tpu.data.datasets import (SyntheticDataset,  # noqa: E402
                                    RealImageDataset)
from sesr_tpu.io.torch_import import load_reference_checkpoint  # noqa: E402
from sesr_tpu.metrics import evaluate_pair  # noqa: E402
from sesr_tpu.models.sesr import forward_float  # noqa: E402
from sesr_tpu.quant.calibrate import calibrate, fake_quant_forward  # noqa: E402
from sesr_tpu.quant.integer import integer_forward  # noqa: E402


def evaluate(task: str, n: int = 6, observer: str = "minmax",
             data_source: str = "synthetic"):
    spec = TASKS[task]
    params = load_reference_checkpoint(task)
    ds = (RealImageDataset if data_source == "real" else
          SyntheticDataset)(task, n=n, hw=(96, 128))
    data = list(ds)
    qp = calibrate(spec, params, [inp for inp, _ in data], observer=observer)
    qp_safe = calibrate(spec, params, [inp for inp, _ in data],
                        observer=observer, safe_zero_floor=True)

    rows = {"fp32": [], "fakequant": [], "int_sim": [], "int_corrected": []}
    for inp, gt in data:
        x = jnp.asarray(inp)
        outs = {
            "fp32": forward_float(spec, params, x),
            "fakequant": fake_quant_forward(spec, params, x),
            "int_sim": integer_forward(spec, qp, x)[0],
            "int_corrected": integer_forward(spec, qp_safe, x, corrected=True)[0],
        }
        for k, y in outs.items():
            p, s = evaluate_pair(task, np.asarray(y)[0], gt[0], inp[0])
            rows[k].append((p, s))
    return {k: (float(np.mean([p for p, _ in v])),
                float(np.mean([s for _, s in v]))) for k, v in rows.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tasks", nargs="*", default=sorted(TASKS))
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--observer", default="minmax")
    ap.add_argument("--data", choices=("synthetic", "real"),
                    default="synthetic",
                    help="real = offline real-photo crops (data/datasets.py builtin_real_images)")
    args = ap.parse_args()

    print(f"{'task':10} {'FP32':>14} {'fake-quant':>14} {'int(ref-exact)':>14} "
          f"{'int(corrected)':>14} {'delta(corr-fp32)':>16}")
    for task in args.tasks:
        r = evaluate(task, args.n, args.observer, args.data)
        d = r["int_corrected"][0] - r["fp32"][0]
        print(f"{task:10} {r['fp32'][0]:8.3f}/{r['fp32'][1]:.3f} "
              f"{r['fakequant'][0]:8.3f}/{r['fakequant'][1]:.3f} "
              f"{r['int_sim'][0]:8.3f}/{r['int_sim'][1]:.3f} "
              f"{r['int_corrected'][0]:8.3f}/{r['int_corrected'][1]:.3f} {d:10.3f}")


if __name__ == "__main__":
    main()
