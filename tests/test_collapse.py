"""Collapse math vs torch: our analytic contraction must reproduce the
reference's delta-function collapse (model_utils_pt.py:29-66) and the
collapsed conv must equal the uncollapsed expand->squeeze composition."""

import numpy as np
import pytest

import jax.numpy as jnp

from sesr_tpu.models.blocks import (
    collapse_block, fold_residual_identity, oihw_to_hwio,
)
from sesr_tpu.ops.conv import conv2d_nhwc

torch = pytest.importorskip("torch")


def _rand_block(rng, ic, oc, t, k):
    w_exp = rng.standard_normal((t, ic, k, k)).astype(np.float32) * 0.1
    w_sq = rng.standard_normal((oc, t, 1, 1)).astype(np.float32) * 0.1
    b_sq = rng.standard_normal((oc,)).astype(np.float32) * 0.1
    return w_exp, w_sq, b_sq


@pytest.mark.parametrize("ic,oc,t,k", [(1, 16, 256, 5), (16, 16, 256, 3), (3, 12, 64, 5)])
def test_collapse_equals_composition(rng, ic, oc, t, k):
    w_exp, w_sq, b_sq = _rand_block(rng, ic, oc, t, k)
    w, b = collapse_block(w_exp, w_sq, b_sq)

    x = rng.standard_normal((2, 9, 11, ic)).astype(np.float32)
    # composition in torch (NCHW)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        y_ref = torch.nn.functional.conv2d(
            torch.nn.functional.conv2d(xt, torch.from_numpy(w_exp), padding=k // 2),
            torch.from_numpy(w_sq), bias=torch.from_numpy(b_sq))
    y_ref = y_ref.numpy().transpose(0, 2, 3, 1)

    y = np.asarray(conv2d_nhwc(jnp.asarray(x), jnp.asarray(oihw_to_hwio(w)),
                               jnp.asarray(b)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-5)


def test_collapse_matches_torch_delta_trick(rng):
    """Directly reproduce the reference's delta-basis collapse in torch and
    compare kernels elementwise."""
    ic = oc = 16
    t, k = 256, 3
    w_exp, w_sq, b_sq = _rand_block(rng, ic, oc, t, k)

    # reference algorithm (model_utils_pt.py:40-56): convolve a delta basis,
    # subtract bias, flip spatially, swap in/out axes
    delta = torch.eye(ic).unsqueeze(2).unsqueeze(3)
    pad = (k - 1) // 2
    delta = torch.nn.functional.pad(delta, (pad, pad, pad, pad))
    with torch.no_grad():
        kb = torch.nn.functional.conv2d(
            torch.nn.functional.conv2d(delta, torch.from_numpy(w_exp), padding=pad),
            torch.from_numpy(w_sq), bias=torch.from_numpy(b_sq))
        kernel = kb - torch.from_numpy(b_sq)[None, :, None, None]
    kernel = torch.flip(kernel, [2, 3]).permute([1, 0, 2, 3]).numpy()

    w, b = collapse_block(w_exp, w_sq, b_sq)
    np.testing.assert_allclose(w, kernel, rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(b, b_sq)


def test_residual_fold(rng):
    w = rng.standard_normal((16, 16, 3, 3)).astype(np.float32)
    wf = fold_residual_identity(w)
    assert np.allclose(wf - w, np.eye(16)[:, :, None, None] *
                       (np.arange(9).reshape(3, 3) == 4))
    # conv with folded kernel == conv + identity
    x = rng.standard_normal((1, 8, 8, 16)).astype(np.float32)
    y_fold = np.asarray(conv2d_nhwc(jnp.asarray(x), jnp.asarray(oihw_to_hwio(wf))))
    y_plain = np.asarray(conv2d_nhwc(jnp.asarray(x), jnp.asarray(oihw_to_hwio(w))))
    np.testing.assert_allclose(y_fold, y_plain + x, rtol=1e-5, atol=1e-5)
