"""Strict per-MAC-saturating conv vs the reference's conv_forward_naive."""

import sys

import numpy as np
import pytest
import jax.numpy as jnp

from sesr_tpu.quant.strict import conv_per_mac_saturating, strict_vs_fast_divergence
from tests.conftest import REFERENCE_ROOT, requires_reference

torch = pytest.importorskip("torch")


def _reference_naive(x_nchw, w_oihw, pad):
    """Run the reference's conv_forward_naive on CPU (its .cuda() calls are
    neutralized for this CPU-only environment)."""
    import types
    stub = types.ModuleType("define")
    for k, v in dict(MFLAG=3, PE=4, QUAN_BIT=8, BIAS_BIT=16, PE_ACC_BIT=18,
                     PE_ADD_BIT=20, REQUAN_BIT=16, REQUAN_N_MAX=32).items():
        setattr(stub, k, v)
    for flag in ["WEIGHT_W_FLG", "INPUT_W_FLG", "BIAS_W_FLG", "BIAS_QUAN_W_FLG",
                 "OUTPUT_PE_W_FLG", "OUTPUT_PE_ADD_W_FLG", "REQUAN_FACTOR_W_FLG",
                 "WEIGHT_W_HIST_PNG", "INPUT_W_HIST_PNG"]:
        setattr(stub, flag, False)
    sys.modules["define"] = stub
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from myQL import quan_modules
    finally:
        sys.path.remove(REFERENCE_ROOT)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        out = quan_modules.conv_forward_naive(
            torch.from_numpy(x_nchw.astype(np.float32)),
            torch.from_numpy(w_oihw.astype(np.float32)),
            stride=1, pad_num=pad, pad_value=0)
    finally:
        torch.Tensor.cuda = orig_cuda
    return out.numpy()


@requires_reference
@pytest.mark.parametrize("k,scale", [(3, 1), (5, 1), (3, 60)])
def test_matches_reference_naive(rng, k, scale):
    """scale=60 forces transient saturation so the per-MAC clamp order is
    actually exercised, not just the unsaturated path."""
    ic, oc = 8, 4
    x = rng.integers(-128, 128, (1, 10, 12, ic)).astype(np.int32) * scale
    w = rng.integers(-127, 128, (k, k, ic, oc)).astype(np.int32)

    got = np.asarray(conv_per_mac_saturating(jnp.asarray(x), w))
    want = _reference_naive(x.transpose(0, 3, 1, 2),
                            np.transpose(w, (3, 2, 0, 1)), k // 2)
    np.testing.assert_array_equal(got.transpose(0, 3, 1, 2), want)


def test_divergence_zero_when_unsaturated(rng):
    x = rng.integers(-16, 16, (1, 8, 8, 4)).astype(np.int32)
    w = rng.integers(-8, 8, (3, 3, 4, 4)).astype(np.int32)
    assert strict_vs_fast_divergence(x, w) == 0


def test_divergence_detected_when_saturating():
    """Transient-only saturation: five +127 taps then four -127 taps on a
    constant x=255 image (all values within the real datapath's ranges).
    In the reference scan order (channel, row, column — quan_modules.py:87-93)
    the strict running sum reaches 5*255*127 = 161925 and clamps at
    2^17-1 = 131071 before the negative taps pull it back, so strict interior
    outputs are 131071 - 4*32385 = 1531; the clamp-once fast model's final
    sum is 1*32385 = 32385 and never saturates. Divergence must be positive
    and cover every interior position."""
    h = w_dim = 6
    x = np.full((1, h, w_dim, 1), 255, np.int32)
    w = np.zeros((3, 3, 1, 1), np.int32)
    w[0, 0, 0, 0] = w[0, 1, 0, 0] = w[0, 2, 0, 0] = 127
    w[1, 0, 0, 0] = w[1, 1, 0, 0] = 127
    w[1, 2, 0, 0] = w[2, 0, 0, 0] = w[2, 1, 0, 0] = w[2, 2, 0, 0] = -127
    d = strict_vs_fast_divergence(x, w)
    assert d >= (h - 2) * (w_dim - 2)   # every fully-interior position flips
    # and the strict value itself is the hand-computed clamped trajectory
    strict = np.asarray(conv_per_mac_saturating(jnp.asarray(x), w))
    assert strict[0, 2, 2, 0] == (1 << 17) - 1 - 4 * 255 * 127
