"""Full product pipeline in one test: QAT-train a fresh network, collapse
it, calibrate + certify a deployment artifact, and run every deployment
lowering on it — the complete reference workflow (train.py -> collapse ->
test.py calibration -> sim.py integer path -> deployment) as ONE
uninterrupted in-framework flow, something the reference can only do via
five hand-sequenced scripts and an output_pt/ file tree."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from sesr_tpu.config import spec_for_task
from sesr_tpu.data.datasets import SyntheticDataset
from sesr_tpu.models.expanded import init_expanded, collapse_expanded
from sesr_tpu.models.sesr import forward_float
from sesr_tpu.ops.packed import (packed_exact_forward, packed_fast_forward,
                                 packed_hybrid_forward)
from sesr_tpu.quant.calibrate import calibrate
from sesr_tpu.quant.certify import certify_fast
from sesr_tpu.quant.integer import integer_forward
from sesr_tpu.quant.qat import QATConfig, make_train_step, prepare


@pytest.mark.parametrize("task", ["nrdm_3", "sr_x2"])
def test_train_calibrate_certify_deploy(task, rng):
    spec = spec_for_task(task)

    # 1. QAT-train a fresh expanded network a few steps
    params = init_expanded(spec, jax.random.PRNGKey(2))
    cfg = QATConfig()
    qstate = prepare(spec, cfg)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(spec, cfg, opt))
    data = list(SyntheticDataset(task, n=2, hw=(32, 48), seed=5))
    for _ in range(4):
        for inp, gt in data:
            params, qstate, opt_state, loss = step(
                params, qstate, opt_state,
                (jnp.asarray(inp), jnp.asarray(gt)))
    assert np.isfinite(float(loss))

    # 2. collapse to inference form; float forward sanity
    collapsed = collapse_expanded(spec, params)
    x = jnp.asarray(data[0][0])
    y_f = forward_float(spec, collapsed, x)
    assert np.isfinite(np.asarray(y_f)).all()

    # 3. calibrate + certify a deployment artifact from the trained weights
    images = [inp for inp, _ in data]
    qp = calibrate(spec, collapsed, images, safe_zero_floor=True)
    qp = certify_fast(spec, qp, images)
    assert qp.fast_cert_layers is not None

    # 4. run every deployment lowering; all must agree with the interpreter
    want, _ = integer_forward(spec, qp, x, corrected=True)
    got_exact = packed_exact_forward(spec, qp, x, (2, 4), corrected=True)
    np.testing.assert_array_equal(np.asarray(got_exact), np.asarray(want))
    if qp.fast_cert_ok:
        got_fast = packed_fast_forward(spec, qp, x, (2, 4))
        np.testing.assert_array_equal(np.asarray(got_fast), np.asarray(want))
    if any(qp.fast_cert_layers):
        got_h = packed_hybrid_forward(spec, qp, x, (2, 4))
        np.testing.assert_array_equal(np.asarray(got_h), np.asarray(want))

    # 5. the integer deployment output tracks the float model it was
    #    quantized from (coarse: within a few dB on its own data). For the
    #    global-input-skip arch (sr_x2) the model output is a RESIDUAL —
    #    with the skip-aware train loss (round 5) the trained residual is
    #    genuinely small, so relative error is scored in the IMAGE domain
    #    (residual + nearest-upsampled input), the task's actual contract.
    err_int = float(jnp.mean((jnp.asarray(want) - y_f) ** 2))
    y_img = y_f
    if spec.global_input_skip:
        y_img = y_f + jnp.repeat(jnp.repeat(x, spec.scaling_factor, axis=1),
                                 spec.scaling_factor, axis=2)
    sig = float(jnp.mean(y_img ** 2)) + 1e-12
    assert err_int / sig < 0.1, (err_int, sig)


def test_artifact_roundtrip_preserves_deployment(tmp_path, rng):
    """save -> load -> identical deployment behaviour (stamps included)."""
    from sesr_tpu.quant.params import QuantParams
    import os

    src = os.path.join(os.path.dirname(__file__), os.pardir, "artifacts",
                       "qparams_nr.npz")
    if not os.path.exists(src):
        pytest.skip("artifact not built")
    qp = QuantParams.load(src)
    qp.save(str(tmp_path / "rt.npz"))
    qp2 = QuantParams.load(str(tmp_path / "rt.npz"))
    assert qp2.fast_cert_layers == qp.fast_cert_layers
    spec = spec_for_task("nr")
    x = rng.random((1, 24, 40, 3), dtype=np.float32)
    a = packed_hybrid_forward(spec, qp, x, (2, 4))
    b = packed_hybrid_forward(spec, qp2, x, (2, 4))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
