"""Float-path parity: our collapsed forward vs the reference torch models,
using the actual shipped checkpoints (SURVEY.md §7 step-2 gate)."""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sesr_tpu.config import spec_for_task, TASKS
from sesr_tpu.io.torch_import import load_reference_checkpoint
from sesr_tpu.models.sesr import forward_float, init_params
from sesr_tpu.ops.conv import pixel_shuffle_nhwc, nearest_upsample_x2
from tests.conftest import REFERENCE_ROOT, requires_reference

torch = pytest.importorskip("torch")


def _reference_model(task):
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        if task == "sr_x4":
            from models import sesr as mod
            model, ckpt = mod.sesr(), "x4sesr.pth"
        elif task == "sr_x2":
            from models import sesr_arch as mod
            model, ckpt = mod.sesr(), "x2sesr.pth.tar"
        elif task == "nrdm_3":
            from models import nrdm_3 as mod
            model, ckpt = mod.nr(), "nrdm_3_raw_G.pth"
        elif task == "nrdm_6":
            from models import nrdm_6 as mod
            model, ckpt = mod.nr(), "nrdm_6_G.pth"
        elif task == "nr":
            from models import nr as mod
            model, ckpt = mod.nr(), "nr_G.pth"
        elif task == "dm":
            from models import dm as mod
            model, ckpt = mod.dm(), "dm_G.pth"
        state = torch.load(f"{REFERENCE_ROOT}/model_params/{ckpt}", map_location="cpu",
                           weights_only=False)
        if task == "sr_x2":
            state = state["state_dict"]
        model = model.float()
        model.load_state_dict(state, strict=False)
        model.collapse()
        model.eval()
        return model
    finally:
        sys.path.remove(REFERENCE_ROOT)


@requires_reference
@pytest.mark.parametrize("task", ["sr_x4", "nrdm_3", "nrdm_6", "sr_x2"])
def test_forward_matches_reference_checkpoint(task, rng):
    spec = spec_for_task(task)
    model = _reference_model(task)
    params = load_reference_checkpoint(task)

    x = rng.random((1, 24, 40, spec.in_channels), dtype=np.float32)
    with torch.no_grad():
        y_ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    y_ref = y_ref.numpy().transpose(0, 2, 3, 1)

    y = np.asarray(forward_float(spec, params, jnp.asarray(x)))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=2e-4)


@requires_reference
def test_qat_collapse_parity_nrdm_6():
    """nrdm_6_qat_G.pth is the one shipped QAT checkpoint no golden can
    exercise (the reference's integer wiring is hard-coded to 5 convs —
    quan_func.py branches on func_id 0/3/4 — so MFLAG 4 cannot run its
    sim). The collapse is still runnable upstream: pin our fake-quant
    delta-response collapse (io/torch_import.py collapse_state_dict_qat)
    against the reference's prepare->load->collapse on the 6-block model,
    within f32 contraction reassociation (same bound as
    test_qat_collapse_parity on nr_qat)."""
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from models import nrdm_6 as mod
        from models import quantize_utils_pt as quantize
        model = mod.nr()
        model.train()
        quantize.prepare(model, inplace=True, a_bits=8, w_bits=8,
                         q_type=0, q_level="C")
        state = torch.load(f"{REFERENCE_ROOT}/model_params/nrdm_6_qat_G.pth",
                           map_location="cpu")
        model = model.float()
        model.load_state_dict(state, strict=False)
        model.collapse()
    finally:
        sys.path.remove(REFERENCE_ROOT)

    params = load_reference_checkpoint("nrdm_6", qat=True)
    convs = ([model.conv_first.conv_expand]
             + [b.conv_expand for b in model.residual_block]
             + [model.conv_last.conv_expand])
    assert len(convs) == len(params.weights) == 8
    for i, conv in enumerate(convs):
        ref_w = conv.weight.detach().numpy()
        ref_b = conv.bias.detach().numpy()
        got_w = np.asarray(params.weights[i]).transpose(3, 2, 0, 1)
        np.testing.assert_allclose(got_w, ref_w, atol=4e-7, rtol=0,
                                   err_msg=f"conv {i}")
        np.testing.assert_array_equal(np.asarray(params.biases[i]), ref_b,
                                      err_msg=f"conv {i}")


@requires_reference
def test_load_qat_add_bounds_matches_goldens():
    """The documented API for the qatf composition's frozen QuantAdd bounds
    must return exactly what the golden generator recorded from the
    checkpoints — including (0.0, 0.0) for sr_x4/sr_x2, whose composition
    loads the FLOAT checkpoint (upstream quirk) and keeps the observers at
    INIT state."""
    import glob
    import os
    from sesr_tpu.io.torch_import import load_qat_add_bounds

    goldens = os.path.join(os.path.dirname(__file__), "goldens")
    checked = 0
    for path in sorted(glob.glob(os.path.join(goldens, "*_qat.npz"))):
        task = os.path.basename(path)[:-len("_qat.npz")]
        g = np.load(path)
        if "qat_add_lo" not in g:
            continue
        lo, hi = load_qat_add_bounds(task)
        assert (lo, hi) == (float(g["qat_add_lo"]), float(g["qat_add_hi"])), task
        checked += 1
    assert checked >= 4      # nr, dm, nrdm_3 + the float-checkpoint quirks
    assert load_qat_add_bounds("sr_x4") == (0.0, 0.0)
    assert load_qat_add_bounds("sr_x2") == (0.0, 0.0)


def test_pixel_shuffle_matches_torch(rng):
    x = rng.standard_normal((2, 5, 7, 16)).astype(np.float32)
    y = np.asarray(pixel_shuffle_nhwc(jnp.asarray(x), 4))
    y_ref = torch.nn.PixelShuffle(4)(
        torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(y, y_ref)


def test_nearest_upsample_matches_reference_skip(rng):
    # reference test.py:149-153 copies each input pixel into a 2x2 block
    x = rng.standard_normal((1, 4, 6, 3)).astype(np.float32)
    y = np.asarray(nearest_upsample_x2(jnp.asarray(x)))
    assert y.shape == (1, 8, 12, 3)
    for i in range(2):
        for j in range(2):
            np.testing.assert_array_equal(y[:, i::2, j::2, :], x)


@pytest.mark.parametrize("task", sorted(TASKS))
def test_forward_shapes(task):
    spec = spec_for_task(task)
    params = init_params(spec, jax.random.PRNGKey(0))
    x = jnp.zeros((1, 16, 24, spec.in_channels))
    y = forward_float(spec, params, x)
    r = spec.scaling_factor
    assert y.shape == (1, 16 * r, 24 * r, spec.out_channels)
