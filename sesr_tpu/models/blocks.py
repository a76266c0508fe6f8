"""Structural-reparameterization collapse, done analytically.

The reference collapses a train-time expand(k x k, in->tmp) -> squeeze(1x1,
tmp->out) block by convolving a delta basis through the pair and flipping the
result (models/model_utils_pt.py:29-66). That is numerically identical to a
single tensor contraction over the tmp axis, which is what we do here — no
delta images, no flips, one einsum.

Residual blocks additionally fold the skip connection as +1 on the kernel
centre diagonal (model_utils_pt.py:79-88).
"""

from __future__ import annotations

import numpy as np


def collapse_block(w_expand_oihw: np.ndarray,
                   w_squeeze_oihw: np.ndarray,
                   b_squeeze: np.ndarray):
    """Collapse expand(k x k, IC->T, no bias) + squeeze(1x1, T->OC, bias).

    Args:
      w_expand_oihw:  (T, IC, k, k) float array (torch OIHW layout).
      w_squeeze_oihw: (OC, T, 1, 1) float array.
      b_squeeze:      (OC,) float array.
    Returns:
      (w_oihw, bias): (OC, IC, k, k) collapsed kernel and (OC,) bias, such
      that conv(x, w) + b == squeeze(expand(x)) for SAME padding, matching
      the reference's delta-function collapse bit-for-... well, float-exactly
      up to fp32 contraction order (validated against torch in
      tests/test_collapse.py).
    """
    w_sq = w_squeeze_oihw[:, :, 0, 0]                      # (OC, T)
    # (OC, T) x (T, IC, k, k) -> (OC, IC, k, k)
    w = np.einsum("ot,tikl->oikl", w_sq.astype(np.float64),
                  w_expand_oihw.astype(np.float64))
    return w.astype(np.float32), b_squeeze.astype(np.float32)


def fold_residual_identity(w_oihw: np.ndarray) -> np.ndarray:
    """Fold a residual skip into a collapsed kernel: +1 at the centre tap of
    each channel's own filter (model_utils_pt.py:84-88). Requires IC == OC."""
    oc, ic, kh, kw = w_oihw.shape
    assert oc == ic, "residual fold needs matching channel counts"
    w = w_oihw.copy()
    mid_h, mid_w = kh // 2, kw // 2
    idx = np.arange(oc)
    w[idx, idx, mid_h, mid_w] += 1.0
    return w


def oihw_to_hwio(w_oihw: np.ndarray) -> np.ndarray:
    """torch OIHW -> TPU-native HWIO weight layout."""
    return np.transpose(w_oihw, (2, 3, 1, 0))


def hwio_to_oihw(w_hwio: np.ndarray) -> np.ndarray:
    return np.transpose(w_hwio, (3, 2, 0, 1))
