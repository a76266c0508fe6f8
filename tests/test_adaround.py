"""AdaRound (quant/adaround.py): API properties and the shipped sr_x4 win.

Round-5 study (tools/adaround_study.py): adaptive weight rounding gains
+0.166/+0.181 dB held-out GT PSNR on sr_x4 across two independent runs and
ships as that task's default recipe (tools/make_qparams.py
WEIGHT_ROUNDING_DEFAULTS); the four small-gap tasks keep nearest.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from sesr_tpu.config import spec_for_task
from sesr_tpu.quant.adaround import optimize_layer_rounding
from sesr_tpu.quant.params import QuantParams

ARTIFACTS = os.path.join(os.path.dirname(__file__), os.pardir, "artifacts")


def test_optimize_layer_rounding_guard_and_range(rng):
    """The optimized rounding is (a) a valid int8 neighbor rounding of
    W/s — every weight within 1 of floor, in range — and (b) never worse
    than round-to-nearest on the inputs it optimized (accept guard)."""
    w = rng.standard_normal((3, 3, 8, 8)).astype(np.float32) * 0.1
    s = float(np.abs(w).max() / 127.0)
    xs = rng.integers(-128, 128, (4, 12, 16, 8)).astype(np.float32)
    w_int, moved, m_near, m_final = optimize_layer_rounding(
        w, s, xs, steps=120)
    assert w_int.dtype == np.int32
    assert (w_int >= -128).all() and (w_int <= 127).all()
    base = np.floor(np.asarray(w, np.float64) / s)
    assert np.isin(w_int - base.astype(np.int64), [0, 1]).all()
    assert m_final <= m_near
    assert 0.0 <= moved <= 1.0


def test_calibrate_override_identity_is_neutral(rng):
    """calibrate(w_int_override=nearest) == calibrate(): the hook changes
    nothing when fed the default rounding."""
    from sesr_tpu.io.torch_import import load_reference_checkpoint
    from sesr_tpu.quant.calibrate import calibrate
    from sesr_tpu.quant.params import quantize_weights

    task = "nrdm_3"
    spec = spec_for_task(task)
    params = load_reference_checkpoint(task)
    images = [rng.random((1, 24, 32, spec.in_channels), dtype=np.float32)
              for _ in range(2)]
    qp_a = calibrate(spec, params, images, safe_zero_floor=True)
    w_int, _ = quantize_weights([np.asarray(w) for w in params.weights],
                                qp_a.hw)
    qp_b = calibrate(spec, params, images, safe_zero_floor=True,
                     w_int_override=w_int)
    for a, b in zip(qp_a.w_int, qp_b.w_int):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(qp_a.a_scale, qp_b.a_scale)
    np.testing.assert_array_equal(qp_a.bias_int[0], qp_b.bias_int[0])


def test_shipped_sr_x4_artifact_carries_the_adaround_win():
    """The shipped sr_x4 artifact (adaround + percentile recipe, 24.87 dB
    seed-77) beats the nearest-rounding KL baseline (24.596 dB),
    and its weights are a genuine neighbor-rounding of the checkpoint
    (every weight within 1 of W/s_w's floor — same scales, only rounding
    choices differ)."""
    from sesr_tpu.data.datasets import RealImageDataset
    from sesr_tpu.io.torch_import import load_reference_checkpoint
    from sesr_tpu.metrics import evaluate_pair
    from sesr_tpu.quant.integer import integer_forward

    task = "sr_x4"
    path = os.path.join(ARTIFACTS, f"qparams_{task}.npz")
    if not os.path.exists(path):
        pytest.skip("sr_x4 artifact missing")
    spec = spec_for_task(task)
    qp = QuantParams.load(path)
    params = load_reference_checkpoint(task)
    for i in range(qp.num_convs):
        base = np.floor(np.asarray(params.weights[i], np.float64)
                        / qp.w_scale[i])
        d = np.asarray(qp.w_int[i], np.int64) - base.astype(np.int64)
        # clipping can pull a saturated weight below floor; ignore at clip
        inside = (np.asarray(qp.w_int[i]) > -128) & (np.asarray(qp.w_int[i])
                                                     < 127)
        assert np.isin(d[inside], [0, 1]).all(), i
    try:
        data = list(RealImageDataset(task, n=6, hw=(96, 128), seed=77))
    except FileNotFoundError:
        pytest.skip("no builtin real images in this environment")
    ps = []
    for inp, gt in data:
        y, _ = integer_forward(spec, qp, jnp.asarray(inp), corrected=True)
        ps.append(evaluate_pair(task, np.asarray(y)[0], gt[0], inp[0])[0])
    assert float(np.mean(ps)) > 24.80, np.mean(ps)
