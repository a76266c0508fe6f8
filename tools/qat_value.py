"""Does QAT fine-tuning actually BUY anything? (VERDICT r2 "what's missing"
#1: the machinery exists and matches the reference, but no experiment showed
QAT improving deployment INT8 PSNR over plain PTQ.)

Protocol (three arms, same budget, same data):
  A. PTQ-only: the shipped reference checkpoint, collapsed -> calibrated ->
     deployment integer path (corrected + safe_zero_floor).
  B. float fine-tune control: fine-tune the EXPANDED float network for
     --steps on the task training distribution, then the same PTQ pipeline.
     (Controls for "QAT won because it trained more".)
  C. QAT fine-tune: same steps/lr/data, but through the fake-quant forward
     (quant/qat.py, STE round, reference q_level="C" quirk), then collapse
     -> PTQ -> deployment integer path.

Scored on held-out real-pixel crops (RealImageDataset seed 77, never seen
by training or calibration). Training pairs come from seeds 1000+ crops of
the same offline real-photo sources through the task degradation.

Reference hooks being exercised: quantize_utils_cuda.py:801-834 (prepare),
train.py:61-63 (the dead QAT trigger its shipped *_qat_G.pth prove once
ran).

Usage: python tools/qat_value.py [--task sr_x4] [--steps 400] [--lr 1e-4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from sesr_tpu.config import TASKS  # noqa: E402
from sesr_tpu.config import REFERENCE_CHECKPOINTS  # noqa: E402
from sesr_tpu.data.datasets import RealImageDataset  # noqa: E402
from sesr_tpu.io.torch_import import _to_numpy_state  # noqa: E402
from sesr_tpu.metrics import evaluate_pair  # noqa: E402
from sesr_tpu.models.expanded import (collapse_expanded,  # noqa: E402
                                      collapse_expanded_qat,
                                      expanded_from_state_dict)
from sesr_tpu.models.sesr import forward_float  # noqa: E402
from sesr_tpu.quant.calibrate import calibrate  # noqa: E402
from sesr_tpu.quant.integer import integer_forward  # noqa: E402
from sesr_tpu.quant.qat import (QATConfig, make_train_step,  # noqa: E402
                                prepare)


def deployment_psnr(task, params_collapsed, calib_imgs, eval_data):
    """Calibrate + deployment integer path, mean PSNR/SSIM on eval_data."""
    spec = TASKS[task]
    qp = calibrate(spec, params_collapsed, calib_imgs, safe_zero_floor=True)
    scores = []
    for inp, gt in eval_data:
        y, _ = integer_forward(spec, qp, jnp.asarray(inp), corrected=True)
        scores.append(evaluate_pair(task, np.asarray(y)[0], gt[0], inp[0]))
    return (float(np.mean([p for p, _ in scores])),
            float(np.mean([s for _, s in scores])))


def finetune(task, expanded, steps, lr, qat: bool, train_data, seed=0):
    spec = TASKS[task]
    cfg = QATConfig() if qat else None
    qstate = prepare(spec, cfg or QATConfig())
    opt = optax.adam(lr)
    opt_state = opt.init(expanded)
    step = jax.jit(make_train_step(spec, cfg, opt))
    params, loss = expanded, float("nan")
    for it in range(steps):
        inp, gt = train_data[it % len(train_data)]
        params, qstate, opt_state, loss = step(
            params, qstate, opt_state, (jnp.asarray(inp), jnp.asarray(gt)))
    return params, float(loss)


def run(task: str, steps: int, lr: float, n_train: int = 16, n_eval: int = 6):
    spec = TASKS[task]
    state = _to_numpy_state(
        f"/root/reference/model_params/{REFERENCE_CHECKPOINTS[task]}")
    expanded = expanded_from_state_dict(spec, state)

    train_data = [d[:2] for d in
                  RealImageDataset(task, n=n_train, hw=(96, 128), seed=1000)]
    eval_data = list(RealImageDataset(task, n=n_eval, hw=(96, 128), seed=77))
    calib_imgs = [inp for inp, _ in train_data[:8]]

    def float_psnr(collapsed):
        scores = []
        for inp, gt in eval_data:
            y = forward_float(spec, collapsed, jnp.asarray(inp))
            scores.append(evaluate_pair(task, np.asarray(y)[0], gt[0],
                                        inp[0]))
        return (float(np.mean([p for p, _ in scores])),
                float(np.mean([s for _, s in scores])))

    results = {}
    base_collapsed = collapse_expanded(spec, expanded)
    results["fp32"] = float_psnr(base_collapsed)
    results["ptq_only"] = deployment_psnr(task, base_collapsed, calib_imgs,
                                          eval_data)

    t0 = time.time()
    ft_float, loss_f = finetune(task, expanded, steps, lr, False, train_data)
    c_float = collapse_expanded(spec, ft_float)
    results["float_ft_fp32"] = float_psnr(c_float)
    results["float_ft_ptq"] = deployment_psnr(task, c_float, calib_imgs,
                                              eval_data)
    ft_qat, loss_q = finetune(task, expanded, steps, lr, True, train_data)
    c_qat = collapse_expanded(spec, ft_qat)
    results["qat_ft_fp32"] = float_psnr(c_qat)
    results["qat_ft_ptq"] = deployment_psnr(task, c_qat, calib_imgs,
                                            eval_data)
    # the reference's own qat deployment collapses THROUGH fake-quant
    # (prepare -> collapse); consistent with the training noise
    c_qat_fq = collapse_expanded_qat(spec, ft_qat)
    results["qat_ft_fqc"] = deployment_psnr(task, c_qat_fq, calib_imgs,
                                            eval_data)
    results["_meta"] = dict(steps=steps, lr=lr, loss_float=loss_f,
                            loss_qat=loss_q, secs=round(time.time() - t0, 1))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="sr_x4")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--lr", type=float, default=1e-4)
    args = ap.parse_args()

    r = run(args.task, args.steps, args.lr)
    print(f"task={args.task} steps={args.steps} lr={args.lr} "
          f"({r['_meta']['secs']}s)")
    for k in ("fp32", "ptq_only", "float_ft_fp32", "float_ft_ptq",
              "qat_ft_fp32", "qat_ft_ptq", "qat_ft_fqc"):
        p, s = r[k]
        print(f"  {k:14} {p:7.3f} dB / {s:.4f}")
    gain_vs_ptq = r["qat_ft_fqc"][0] - r["ptq_only"][0]
    gain_vs_float = r["qat_ft_fqc"][0] - r["float_ft_ptq"][0]
    gap_float = r["float_ft_fp32"][0] - r["float_ft_ptq"][0]
    gap_qat = r["qat_ft_fp32"][0] - r["qat_ft_ptq"][0]
    gap_fqc = r["qat_ft_fp32"][0] - r["qat_ft_fqc"][0]
    print(f"  QAT(+fq collapse) gain vs PTQ-only: {gain_vs_ptq:+.3f} dB; "
          f"vs float-finetune control: {gain_vs_float:+.3f} dB")
    print(f"  quantization gap (own-float -> int8): "
          f"float-ft {gap_float:+.3f} dB, QAT-ft(float collapse) "
          f"{gap_qat:+.3f} dB, QAT-ft(fq collapse) {gap_fqc:+.3f} dB")


if __name__ == "__main__":
    main()
