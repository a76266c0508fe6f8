"""QAT: parity vs the reference fake-quant stack + training mechanics."""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sesr_tpu.config import spec_for_task
from sesr_tpu.models.expanded import (
    ExpandedParams, expanded_from_state_dict, forward_expanded, init_expanded,
    collapse_expanded,
)
from sesr_tpu.models.sesr import forward_float
from sesr_tpu.quant.qat import (
    QATConfig, QuantizerState, prepare, qat_forward, fake_quant,
    make_train_step, qat_state_from_state_dict,
)
from tests.conftest import REFERENCE_ROOT, requires_reference

torch = pytest.importorskip("torch")


def _np_state(path):
    sd = torch.load(path, map_location="cpu", weights_only=False)
    return {k: v.detach().numpy() for k, v in sd.items()}


@requires_reference
def test_qat_eval_matches_reference_checkpoint(rng):
    """Our functional QAT forward (training=False) vs the reference's
    prepared+loaded QuantConv2d/QuantAdd model in eval mode."""
    spec = spec_for_task("sr_x4")
    path = f"{REFERENCE_ROOT}/model_params/sr_qat_G.pth"

    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from models import sesr as ref_sesr
        from models import quantize_utils_pt as quantize
        model = ref_sesr.sesr().float()
        quantize.prepare(model, inplace=True, a_bits=8, w_bits=8,
                         q_type=0, q_level="C")
        state = torch.load(path, map_location="cpu", weights_only=False)
        model.load_state_dict(state, strict=False)
        model.eval()
    finally:
        sys.path.remove(REFERENCE_ROOT)

    x = rng.random((1, 16, 24, 1), dtype=np.float32)
    with torch.no_grad():
        y_ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    y_ref = y_ref.transpose(0, 2, 3, 1)

    np_state = _np_state(path)
    params = expanded_from_state_dict(spec, np_state)
    qstate = qat_state_from_state_dict(spec, np_state)
    y, _ = qat_forward(spec, QATConfig(), params, qstate,
                       jnp.asarray(x), training=False)
    # Fake-quantized activations sit exactly on .5 rounding boundaries, so
    # f32 conv-reassociation noise (~1e-7, torch vs XLA summation order)
    # flips individual roundings; differences are bounded by ~one
    # quantization step of the widest activation domain and must be small on
    # average.
    diff = np.abs(np.asarray(y) - y_ref)
    max_step = 0.0126  # largest act quantizer scale in sr_qat_G.pth
    assert diff.max() <= 1.5 * max_step, diff.max()
    assert diff.mean() < 1.5e-3, diff.mean()


def test_expanded_forward_matches_collapsed(rng):
    spec = spec_for_task("nrdm_3")
    params = init_expanded(spec, jax.random.PRNGKey(0))
    x = jnp.asarray(rng.random((1, 12, 18, 3), dtype=np.float32))
    y_exp = forward_expanded(spec, params, x)
    y_col = forward_float(spec, collapse_expanded(spec, params), x)
    np.testing.assert_allclose(np.asarray(y_exp), np.asarray(y_col),
                               rtol=5e-3, atol=5e-4)


def test_ste_gradient_clipping():
    state = QuantizerState(jnp.array([-1.0]), jnp.array([1.0]),
                           jnp.ones((), jnp.int32))

    def f(x):
        return jnp.sum(fake_quant(x, state, 8, 0, is_weight=False))

    g = jax.grad(f)(jnp.array([0.5, -0.3, 5.0, -4.0]))
    # inside the observer range the STE passes gradient 1; outside it clips to 0
    np.testing.assert_allclose(np.asarray(g), [1.0, 1.0, 0.0, 0.0])


def test_fake_quant_values_symmetric():
    state = QuantizerState(jnp.array([-2.0]), jnp.array([1.0]),
                           jnp.ones((), jnp.int32))
    x = jnp.array([0.0, 1.0, -2.0, 0.004, 5.0])
    y = np.asarray(fake_quant(x, state, 8, 0, is_weight=False))
    scale = 2.0 / 127.5
    assert y[0] == 0.0
    np.testing.assert_allclose(y[1], round(1.0 / scale) * scale, rtol=1e-6)
    np.testing.assert_allclose(y[4], 127 * scale, rtol=1e-6)  # clamped


@pytest.mark.parametrize("use_qat", [False, True])
def test_train_step_reduces_loss(use_qat, rng):
    import optax

    spec = spec_for_task("nrdm_3")
    params = init_expanded(spec, jax.random.PRNGKey(1))
    cfg = QATConfig() if use_qat else None
    qstate = prepare(spec, cfg or QATConfig())
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(spec, cfg, opt))

    x = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    gt = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32) * 0.5 + 0.25)

    losses = []
    for _ in range(8):
        params, qstate, opt_state, loss = step(params, qstate, opt_state, (x, gt))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_qat_finetune_value_pins():
    """QAT VALUE, demonstrated with a control (VERDICT r2 missing #1;
    tools/qat_value.py, table + discussion in BASELINE.md). The robust,
    pool-invariant effects — measured across two real-pixel crop pools and
    three training configs, deterministic seeds — are pinned:

    1. the fake-quant-consistent collapse ELIMINATES the own-float -> int8
       quantization gap (measured -0.29..0.00 dB) while the float-finetune
       control keeps a positive gap (+0.17..+0.43 dB);
    2. QAT + consistent collapse never falls below plain PTQ at this
       config (+0.1..+2.9 dB across pools/configs).

    The naive "QAT beats PTQ by N dB" headline is NOT pinned: the control
    arm shows it is mostly distribution adaptation and pool-dependent
    (see BASELINE.md)."""
    import os
    import sys

    repo = os.path.join(os.path.dirname(__file__), os.pardir)
    sys.path.insert(0, os.path.join(repo, "tools"))
    import qat_value

    r = qat_value.run("sr_x4", steps=300, lr=1e-4)
    gap_fqc = r["qat_ft_fp32"][0] - r["qat_ft_fqc"][0]
    gap_float = r["float_ft_fp32"][0] - r["float_ft_ptq"][0]
    assert gap_fqc <= 0.15, (gap_fqc, r)
    assert gap_fqc <= gap_float, (gap_fqc, gap_float)
    assert r["qat_ft_fqc"][0] >= r["ptq_only"][0], r


@requires_reference
def test_train_loss_respects_global_input_skip():
    """sr_x2 (MFLAG 6) predicts a RESIDUAL: the reference adds the
    nearest-upsampled input outside the model at eval (test.py:149-155)
    and never trains this arch, so the train-time convention is this
    framework's to define. make_train_step must score
    y + nearest_up(x) against the full-image gt — before this was fixed,
    300 fine-tune steps drove the reference checkpoint from 30.4 to
    13.9 dB held-out (round-5 probe) because the loss taught the net to
    predict the full image that evaluate_pair then double-counted.

    Pins: (1) the skip-aware loss at the GOOD reference checkpoint is
    small, and much smaller than the raw-output MSE the buggy convention
    computed; (2) a few steps keep it small (no immediate divergence)."""
    import os
    import optax
    from sesr_tpu.config import REFERENCE_CHECKPOINTS
    from sesr_tpu.data.datasets import RealImageDataset
    from sesr_tpu.io.torch_import import _to_numpy_state

    spec = spec_for_task("sr_x2")
    state = _to_numpy_state(os.path.join(
        REFERENCE_ROOT, "model_params", REFERENCE_CHECKPOINTS["sr_x2"]))
    params = expanded_from_state_dict(spec, state)
    inp, gt = RealImageDataset("sr_x2", n=1, hw=(48, 64), seed=1000)[0][:2]
    x, g = jnp.asarray(inp), jnp.asarray(gt)

    cfg = QATConfig()
    qstate = prepare(spec, cfg)
    y, _ = qat_forward(spec, cfg, params, qstate, x, training=True)
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    loss_skip_aware = float(jnp.mean((y + up - g) ** 2))
    loss_raw = float(jnp.mean((y - g) ** 2))
    assert loss_skip_aware < 0.05, loss_skip_aware
    assert loss_raw > 3 * loss_skip_aware, (loss_raw, loss_skip_aware)

    opt = optax.adam(1e-4)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(spec, cfg, opt))
    for _ in range(4):
        params, qstate, opt_state, loss = step(params, qstate, opt_state,
                                               (x, g))
    assert float(loss) < 0.05, float(loss)
