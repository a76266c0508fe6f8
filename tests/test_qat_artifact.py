"""The shipped QAT-closed sr_x4 artifact (round-5 verdict item 1).

The round-3 study (tools/qat_value.py, pinned in tests/test_qat.py) proved
that QAT fine-tuning + the fake-quant-delta collapse eliminates the
own-float -> int8 quantization gap; these tests pin the SHIPPED product of
that recipe (tools/make_qparams.py build_qat_artifact): the held-out gap
of artifacts/qparams_sr_x4_qat.npz against its own FP32 weights is under
0.5 dB — sr_x4 was the one task still above 1 dB with PTQ alone
(BASELINE.md observer table: 1.1 dB with the shipped KL calibration).
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from sesr_tpu.config import spec_for_task
from sesr_tpu.metrics import evaluate_pair
from sesr_tpu.models.sesr import CollapsedParams, forward_float
from sesr_tpu.quant.integer import integer_forward
from sesr_tpu.quant.params import QuantParams

ARTIFACTS = os.path.join(os.path.dirname(__file__), os.pardir, "artifacts")
QP_PATH = os.path.join(ARTIFACTS, "qparams_sr_x4_qat.npz")
CK_PATH = os.path.join(ARTIFACTS, "sr_x4_qat_collapsed.npz")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(QP_PATH) and os.path.exists(CK_PATH)),
    reason="QAT artifact missing (python tools/make_qparams.py "
           "--qat sr_x4 --tasks)")


def _load():
    spec = spec_for_task("sr_x4")
    ck = np.load(CK_PATH)
    params = CollapsedParams(
        [ck[f"w_{i}"] for i in range(spec.num_convs)],
        [ck[f"b_{i}"] for i in range(spec.num_convs)])
    return spec, params, QuantParams.load(QP_PATH)


def test_qat_artifact_heldout_gap_under_half_db():
    """Held-out (seed-77, never seen by training or calibration) own-FP32
    vs deployment-INT8 gap < 0.5 dB — the study's gap-elimination effect,
    shipped."""
    from sesr_tpu.data.datasets import RealImageDataset

    spec, params, qp = _load()
    eval_data = list(RealImageDataset("sr_x4", n=6, hw=(96, 128), seed=77))
    fp, ip = [], []
    for inp, gt in eval_data:
        yf = forward_float(spec, params, jnp.asarray(inp))
        fp.append(evaluate_pair("sr_x4", np.asarray(yf)[0], gt[0],
                                inp[0])[0])
        yi, _ = integer_forward(spec, qp, jnp.asarray(inp), corrected=True)
        ip.append(evaluate_pair("sr_x4", np.asarray(yi)[0], gt[0],
                                inp[0])[0])
    gap = float(np.mean(fp)) - float(np.mean(ip))
    assert gap < 0.5, (
        f"QAT artifact held-out gap {gap:+.3f} dB (own FP32 "
        f"{np.mean(fp):.3f}, INT8 {np.mean(ip):.3f}) — the recipe's "
        "gap-elimination regressed")


def test_qat_artifact_is_certified_and_serves():
    """The QAT artifact went through the same certify/serve machinery as
    every shipped artifact: stamped, geometry-gated, and its certificate-
    selected packed lowering equals the interpreter bit-exactly."""
    from sesr_tpu.ops.packed import select_packed_forward

    spec, _params, qp = _load()
    assert qp.fast_cert_layers is not None and qp.cert_cells
    mode, fwd = select_packed_forward(qp)
    rng = np.random.default_rng(23)
    x = rng.random((1, 48, 64, 1), dtype=np.float32)
    y = fwd(spec, qp, jnp.asarray(x), s=qp.cert_cells[0])
    y_exact, _ = integer_forward(spec, qp, jnp.asarray(x), corrected=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_exact))


def test_eval_float_loads_npz_collapsed_checkpoint(capsys):
    """eval-float --checkpoint x.npz scores this framework's own trained
    models (the w_{i}/b_{i} layout train --out writes) — the QAT
    artifact's FP32 reference is usable through the standard CLI."""
    from sesr_tpu.cli import main

    main(["eval-float", "--task", "sr_x4", "--checkpoint", CK_PATH,
          "--n-images", "1"])
    out = capsys.readouterr().out
    assert "mean psnr" in out
    assert float(out.split("psnr:")[1].split()[0]) > 15.0


def test_qat_artifact_weights_differ_from_ptq():
    """The QAT artifact is a genuinely different network than the PTQ
    artifact built from the raw reference checkpoint (its int weights were
    fine-tuned through fake-quant), not a re-calibration."""
    ptq_path = os.path.join(ARTIFACTS, "qparams_sr_x4.npz")
    if not os.path.exists(ptq_path):
        pytest.skip("PTQ sr_x4 artifact missing")
    _spec, _params, qp = _load()
    qp_ptq = QuantParams.load(ptq_path)
    assert any(not np.array_equal(a, b)
               for a, b in zip(qp.w_int, qp_ptq.w_int))
